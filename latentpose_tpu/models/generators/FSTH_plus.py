"""FSTH_plus generator (reference ``generators/FSTH_plus.py``): the flagship
AdaIN-from-constant decoder, but "pose" = the raw 68x2 keypoints minus 0.5
(136-d, ``:135``), and the affine projector is a plain (non-spectral-norm)
3-layer LeakyReLU(0.05) MLP (``:96-103``).  Fine-tuning trains the identity
embedding, like the flagship."""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.models.generators import \
    vector_pose_unsupervised_segmentation_noBottleneck as flagship
from latentpose_tpu.ops import initializers as tinit
from latentpose_tpu.ops import norms as norm_ops
from latentpose_tpu.ops.spectral_norm import SNConv
from latentpose_tpu.nn.blocks import ResBlock


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--gen_constant_input_size", type=int, default=4)
        parser.add("--gen_num_residual_blocks", type=int, default=2)
        parser.add("--gen_padding", type=str, default="zero")
        parser.add("--norm_layer", type=str, default="in")

    @staticmethod
    def get_net(args):
        return Generator(
            padding=args.gen_padding,
            out_channels=args.out_channels + 1,
            num_channels=args.num_channels,
            max_num_channels=args.max_num_channels,
            identity_embedding_size=args.embed_channels,
            pose_embedding_size=136,  # 68 keypoints x 2
            constant_input_size=args.gen_constant_input_size,
            num_residual_blocks=args.gen_num_residual_blocks,
            output_image_size=args.image_size,
        )


class Generator(flagship.Generator):
    INPUT_KEYS = ("embeds", "dec_keypoints")
    FINETUNE_PARAM = "embedding"

    @nn.compact
    def __call__(self, inputs, update_stats: bool = False):
        identity_embedding = inputs["embeds"]
        keypoints = inputs["dec_keypoints"]
        if keypoints.ndim > 2:
            keypoints = keypoints[:, 0]
        pose_embedding = keypoints - 0.5  # reference :135

        blocks, adain_features, _ = self._schedule()
        batch = pose_embedding.shape[0]

        joint = jnp.concatenate([identity_embedding, pose_embedding],
                                axis=-1)
        hidden = max(512, joint.shape[-1])
        h = nn.Dense(hidden, kernel_init=tinit.torch_conv_kernel_init,
                     name="projector_0")(joint)
        h = nn.leaky_relu(h, 0.05)
        h = nn.Dense(hidden, kernel_init=tinit.torch_conv_kernel_init,
                     name="projector_1")(h)
        h = nn.leaky_relu(h, 0.05)
        affine = nn.Dense(sum(2 * f for f in adain_features),
                          kernel_init=tinit.torch_conv_kernel_init,
                          name="projector_2")(h)

        ada_params = []
        offset = 0
        for f in adain_features:
            bias = affine[:, offset:offset + f]
            weight = affine[:, offset + f:offset + 2 * f]
            ada_params.append((weight, bias))
            offset += 2 * f

        c0 = blocks[0][0]
        constant = self.param(
            "constant", nn.initializers.ones,
            (1, self.constant_input_size, self.constant_input_size, c0))
        x = jnp.broadcast_to(constant,
                             (batch,) + constant.shape[1:]).astype(
            pose_embedding.dtype)

        for i, (in_ch, out_ch, up) in enumerate(blocks):
            x = ResBlock(in_ch, out_ch, norm_layer="adain", upsample=up,
                         padding=self.padding, name=f"block{i}")(
                x, ada0=ada_params[2 * i], ada1=ada_params[2 * i + 1],
                update_stats=update_stats)

        w, b = ada_params[-1]
        x = norm_ops.adain(x, w, b)
        x = nn.relu(x)
        x = SNConv(self.out_channels, (3, 3), padding=1, use_bias=True,
                   name="head_conv")(x, update_stats)
        x = jnp.tanh(x)

        rgb, segm = x[..., :-1], x[..., -1:]
        rgb = rgb * 0.75 + 0.5
        segm = segm * 0.5 + 0.5
        return rgb * segm, segm
