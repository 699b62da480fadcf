"""Lightweight conv embedder (no reference counterpart).

A small strided-conv tower for both identity and pose paths.  Exists for
fast CI/experimentation and as the hermetic-test embedder — the flagship
ResNeXt-50/MobileNetV2 embedder
(``unsupervised_pose_separate_embResNeXt_segmentation``) is the parity
model.  Implements the same interface/contract.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--average_function", type=str, default="sum",
                   help="sum|max")
        parser.add("--simple_embedder_width", type=int, default=32)

    @staticmethod
    def get_net(args):
        return Embedder(
            identity_embedding_size=args.embed_channels,
            pose_embedding_size=args.pose_embedding_size,
            average_function=args.average_function,
            width=getattr(args, "simple_embedder_width", 32),
        )


class _Tower(nn.Module):
    out_size: int
    width: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        w = self.width
        for i in range(4):
            h = nn.Conv(w, (3, 3), strides=(2, 2), padding=1,
                        name=f"conv{i}")(h)
            h = nn.relu(h)
            w = min(w * 2, 256)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.out_size, name="fc")(h)


class Embedder(nn.Module):
    INPUT_KEYS = ("enc_rgbs", "pose_input_rgbs")

    identity_embedding_size: int = 512
    pose_embedding_size: int = 256
    average_function: str = "sum"
    width: int = 32
    dtype: Any = None

    def setup(self):
        self.identity_encoder = _Tower(self.identity_embedding_size,
                                       self.width)
        self.pose_encoder = _Tower(self.pose_embedding_size, self.width)

    def get_identity_embedding(self, enc_rgbs, train: bool = False):
        b, k, h, w, c = enc_rgbs.shape
        emb = self.identity_encoder(enc_rgbs.reshape(b * k, h, w, c), train)
        emb = emb.reshape(b, k, self.identity_embedding_size)
        agg = emb.mean(axis=1) if self.average_function == "sum" \
            else emb.max(axis=1)
        return agg, emb

    def get_pose_embedding(self, pose_input_rgbs, train: bool = False):
        return self.pose_encoder(pose_input_rgbs[:, 0], train)

    def __call__(self, enc_rgbs, pose_input_rgbs, train: bool = False,
                 compute_identity: bool = True):
        if compute_identity:
            embeds, elemwise = self.get_identity_embedding(enc_rgbs, train)
        else:
            embeds, elemwise = None, None
        pose = self.get_pose_embedding(pose_input_rgbs, train)
        return embeds, elemwise, pose
