"""Flagship embedder: ResNeXt-50 identity encoder + MobileNetV2 latent-pose
encoder.

Behavioral parity with the reference
``embedders/unsupervised_pose_separate_embResNeXt_segmentation.py``:
- identity: resnext50_32x4d(num_classes=512) over the K=8 identity frames,
  frames folded into the batch axis, then mean ('sum') or max over frames
  (reference ``:37-54``);
- pose: mobilenet_v2(num_classes=256) on driver frame 0 (reference ``:56-58``)
  — unsupervised latent pose, no landmarks;
- during fine-tuning the identity path is skipped entirely (reference
  ``:34,60-63``); our runner simply stops calling
  ``get_identity_embedding`` and feeds the per-avatar embedding from the
  train state.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.nn.backbones import MobileNetV2, ResNeXt50


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--average_function", type=str, default="sum",
                   help="sum|max")

    @staticmethod
    def get_net(args):
        import jax.numpy as jnp
        dtype = jnp.bfloat16 if getattr(args, "compute_dtype",
                                        "float32") == "bfloat16" else None
        return Embedder(
            identity_embedding_size=args.embed_channels,
            pose_embedding_size=args.pose_embedding_size,
            average_function=args.average_function,
            dtype=dtype,
        )


class Embedder(nn.Module):
    INPUT_KEYS = ("enc_rgbs", "pose_input_rgbs")

    identity_embedding_size: int = 512
    pose_embedding_size: int = 256
    average_function: str = "sum"
    dtype: Any = None

    def setup(self):
        self.identity_encoder = ResNeXt50(
            num_classes=self.identity_embedding_size, dtype=self.dtype)
        self.pose_encoder = MobileNetV2(
            num_classes=self.pose_embedding_size, dtype=self.dtype)

    def get_identity_embedding(self, enc_rgbs, train: bool = False):
        """enc_rgbs: (B, K, H, W, 3) identity frames.

        Returns (embeds (B, 512), embeds_elemwise (B, K, 512)).
        """
        b, k, h, w, c = enc_rgbs.shape
        flat = enc_rgbs.reshape(b * k, h, w, c)
        emb = self.identity_encoder(flat, train=train)
        emb = emb.reshape(b, k, self.identity_embedding_size)
        if self.average_function == "sum":
            agg = emb.mean(axis=1)
        elif self.average_function == "max":
            agg = emb.max(axis=1)
        else:
            raise ValueError(
                "average_function must be 'sum' or 'max', got "
                f"{self.average_function!r}")
        return agg, emb

    def get_pose_embedding(self, pose_input_rgbs, train: bool = False):
        """pose_input_rgbs: (B, T, H, W, 3); uses driver frame 0."""
        return self.pose_encoder(pose_input_rgbs[:, 0], train=train)

    def __call__(self, enc_rgbs, pose_input_rgbs, train: bool = False,
                 compute_identity: bool = True):
        if compute_identity:
            embeds, embeds_elemwise = self.get_identity_embedding(
                enc_rgbs, train)
        else:
            embeds, embeds_elemwise = None, None
        pose = self.get_pose_embedding(pose_input_rgbs, train)
        return embeds, embeds_elemwise, pose
