"""Flagship generator: StyleGAN-like AdaIN decoder from a learned constant.

Behavioral parity with the reference
``generators/vector_pose_unsupervised_segmentation_noBottleneck.py``:

- learned 512 x S x S constant input (S = ``gen_constant_input_size`` = 4)
  initialized to ones (reference ``:31-37``);
- ``gen_num_residual_blocks`` (=2) AdaIN residual blocks at constant
  resolution, then log2(image_size / S) (=6) AdaIN upsampling residual blocks
  with channel schedule min(64 * 2^k, 512) (reference ``:60-80``);
- head: AdaIN -> ReLU -> SNConv3x3 -> tanh producing out_channels+1 maps;
  RGB remapped to (-0.25, 1.25), segmentation to (0, 1);
  ``fake_rgbs = rgb * segmentation`` (reference ``:165-181``);
- identity ⊕ pose embeddings -> SN MLP (``affine_params_projector``,
  reference ``:97-101``) -> per-sample (bias, weight) for every AdaIN, packed
  in module order with *bias first* (reference ``assign_affine_params``
  ``:108-125``).

TPU-native design: AdaIN (scale, bias) are *passed down the call* instead of
imperatively assigned; fine-tuning (reference ``:139-163``) is a pure
re-parameterization — the per-avatar identity embedding lives in the train
state (``runners/finetune.py``) and is fed through the ordinary
``identity_embedding`` argument, so the generator itself never mutates.
"""

from __future__ import annotations

import math
from typing import Any, List, Tuple

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.nn.blocks import ResBlock
from latentpose_tpu.ops import norms as norm_ops
from latentpose_tpu.ops.spectral_norm import SNConv, SNDense


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--gen_constant_input_size", type=int, default=4)
        parser.add("--gen_num_residual_blocks", type=int, default=2)
        parser.add("--gen_padding", type=str, default="zero",
                   help="zero|reflection")
        parser.add("--norm_layer", type=str, default="in")

    @staticmethod
    def get_net(args):
        return Generator(
            padding=args.gen_padding,
            quantize=getattr(args, "quantize", "")
            in ("int8", "int8_static"),
            quant_static=getattr(args, "quantize", "") == "int8_static",
            out_channels=args.out_channels + 1,  # +1 segmentation channel
            num_channels=args.num_channels,
            max_num_channels=args.max_num_channels,
            identity_embedding_size=args.embed_channels,
            pose_embedding_size=args.pose_embedding_size,
            norm_layer=args.norm_layer,
            constant_input_size=args.gen_constant_input_size,
            num_residual_blocks=args.gen_num_residual_blocks,
            output_image_size=args.image_size,
        )


class Generator(nn.Module):
    padding: str = "zero"
    out_channels: int = 4
    num_channels: int = 64
    max_num_channels: int = 512
    identity_embedding_size: int = 512
    pose_embedding_size: int = 256
    norm_layer: str = "in"
    constant_input_size: int = 4
    num_residual_blocks: int = 2
    output_image_size: int = 256
    dtype: Any = None
    # int8 MXU inference path for the decoder blocks (drive --quantize int8;
    # ops/quant.py).  The head conv stays bf16 — output quality is most
    # sensitive there and it is only ~3% of decoder time.
    quantize: bool = False
    # --quantize int8_static: calibrated per-input-channel activation
    # scales ('quant_calib' collection) + bf16 epilogues (ops/quant.py)
    quant_static: bool = False

    def _schedule(self) -> Tuple[List[Tuple[int, int, bool]], List[int], int]:
        """Static channel plan.

        Returns (blocks, adain_features, head_features) where blocks is a list
        of (in_ch, out_ch, upsample) and adain_features lists the feature
        count of every AdaIN in module order (norm0, norm1 per block, then the
        head AdaIN) — the packing order of the projector output.
        """
        ratio = self.output_image_size / self.constant_input_size
        assert math.log2(ratio).is_integer(), \
            "constant_input_size must divide image_size by a power of 2"
        num_up = int(math.log2(ratio))
        ch_nonclamped = self.num_channels * (2 ** num_up)
        ch = min(ch_nonclamped, self.max_num_channels)

        blocks: List[Tuple[int, int, bool]] = []
        for _ in range(self.num_residual_blocks):
            blocks.append((ch, ch, False))
        for _ in range(num_up):
            in_ch = ch
            ch_nonclamped //= 2
            ch = min(ch_nonclamped, self.max_num_channels)
            blocks.append((in_ch, ch, True))

        adain_features: List[int] = []
        for in_ch, out_ch, _ in blocks:
            adain_features += [in_ch, out_ch]
        adain_features.append(ch)  # head AdaIN
        return blocks, adain_features, ch

    def num_affine_params(self) -> int:
        _, feats, _ = self._schedule()
        return sum(2 * f for f in feats)

    # Uniform generator-plugin protocol: which data_dict keys feed forward.
    INPUT_KEYS = ("embeds", "pose_embedding")
    # What the fine-tune re-parameterization trains (reference :139-163:
    # the identity embedding itself becomes the trainable parameter).
    FINETUNE_PARAM = "embedding"

    @nn.compact
    def __call__(self, inputs, update_stats: bool = False):
        """inputs: dict with 'embeds' (B, 512) and 'pose_embedding' (B, 256).

        Returns (fake_rgbs, fake_segm): (B, H, W, 3) and (B, H, W, 1).
        """
        identity_embedding = inputs["embeds"]
        pose_embedding = inputs["pose_embedding"]
        blocks, adain_features, head_ch = self._schedule()
        batch = pose_embedding.shape[0]

        joint = jnp.concatenate(
            [identity_embedding, pose_embedding], axis=-1)
        joint_size = (self.identity_embedding_size
                      + self.pose_embedding_size)
        hidden = max(joint_size, 512)
        h = SNDense(hidden, name="projector_0")(joint, update_stats)
        h = nn.relu(h)
        affine = SNDense(sum(2 * f for f in adain_features),
                         name="projector_1")(h, update_stats)

        # Unpack per-AdaIN (bias, weight) chunks — bias first (reference
        # assign_affine_params :108-125).
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
        # activations follow the input precision (bf16 mixed-precision path)
        x = jnp.broadcast_to(
            constant, (batch,) + constant.shape[1:]).astype(
                pose_embedding.dtype)

        for i, (in_ch, out_ch, up) in enumerate(blocks):
            # 'ada' + norm_layer; only 'adain' is live (the reference's 'bn'
            # path references a never-imported SyncBatchNorm — dead code).
            x = ResBlock(in_ch, out_ch, norm_layer="adain",
                         quant_static=self.quant_static,
                         upsample=up, padding=self.padding,
                         quantize=self.quantize,
                         name=f"block{i}")(
                x, ada0=ada_params[2 * i], ada1=ada_params[2 * i + 1],
                update_stats=update_stats)

        w, b = ada_params[-1]
        x = norm_ops.adain(x, w, b)
        x = nn.relu(x)
        x = SNConv(self.out_channels, (3, 3), padding=1, use_bias=True,
                   name="head_conv")(x, update_stats)
        x = jnp.tanh(x)

        rgb, segm = x[..., :-1], x[..., -1:]
        rgb = rgb * 0.75 + 0.5        # tanh range -> (-0.25, 1.25)
        segm = segm * 0.5 + 0.5       # tanh range -> (0, 1)
        return rgb * segm, segm
