"""FAbNet-pretrained-pose embedder (reference
``embedders/FAbNet_pretrained_embResNeXt.py``): ResNeXt-50 identity encoder
+ a *frozen* FAb-Net 256-d encoder as the pose descriptor (``:30-53,81-84``).

FAb-Net (Wiles et al. 2018): a strided conv encoder to a 256-d bottleneck.
Freezing is functional (stop-gradient on the pose vector).  Paper-parity
requires converted FAb-Net release weights; otherwise random init + warning.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.nn.backbones import ResNeXt50

logger = logging.getLogger("latentpose_tpu.models.fabnet_emb")


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--average_function", type=str, default="sum")

    @staticmethod
    def get_net(args):
        from latentpose_tpu.utils.weights import find_weights_file
        if find_weights_file("fabnet.npz") is None:
            logger.warning(
                "FAbNet_pretrained_embResNeXt: converted FAb-Net weights "
                "(fabnet.npz) not found — the frozen pose encoder is "
                "randomly initialized (ablation plumbing only; WEIGHTS.md)")
        return Embedder(
            identity_embedding_size=args.embed_channels,
            pose_embedding_size=args.pose_embedding_size,
            average_function=args.average_function,
        )


class FAbNetEncoder(nn.Module):
    """FAb-Net-style encoder: 6 strided convs + BN + LeakyReLU -> 256-d."""

    out_size: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for i, width in enumerate((64, 128, 256, 512, 512, 512)):
            h = nn.Conv(width, (4, 4), strides=(2, 2), padding=1,
                        name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = h.mean(axis=(1, 2))
        return jnp.tanh(nn.Dense(self.out_size, name="fc")(h))


class Embedder(nn.Module):
    INPUT_KEYS = ("enc_rgbs", "pose_input_rgbs")
    PRETRAINED = (("pose_encoder", "fabnet.npz", ""),)

    identity_embedding_size: int = 512
    pose_embedding_size: int = 256
    average_function: str = "sum"
    dtype: Any = None

    def setup(self):
        self.identity_encoder = ResNeXt50(
            num_classes=self.identity_embedding_size)
        self.pose_encoder = FAbNetEncoder(self.pose_embedding_size)

    def get_identity_embedding(self, enc_rgbs, train: bool = False):
        b, k, h, w, c = enc_rgbs.shape
        emb = self.identity_encoder(enc_rgbs.reshape(b * k, h, w, c),
                                    train=train)
        emb = emb.reshape(b, k, self.identity_embedding_size)
        agg = emb.mean(axis=1) if self.average_function == "sum" \
            else emb.max(axis=1)
        return agg, emb

    def get_pose_embedding(self, pose_input_rgbs, train: bool = False):
        x = pose_input_rgbs[:, 0] if pose_input_rgbs.ndim > 4 \
            else pose_input_rgbs
        # frozen sub-network (eval mode, no BN updates, no gradient)
        pose = self.pose_encoder(x, train=False)
        return jax.lax.stop_gradient(pose)

    def __call__(self, enc_rgbs, pose_input_rgbs, train: bool = False,
                 compute_identity: bool = True):
        if compute_identity:
            embeds, elemwise = self.get_identity_embedding(enc_rgbs, train)
        else:
            embeds, elemwise = None, None
        pose = self.get_pose_embedding(pose_input_rgbs, train)
        return embeds, elemwise, pose
