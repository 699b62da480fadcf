"""FSTH embedder (Zakharov et al. few-shot-talking-heads reproduction).

Parity with reference ``embedders/FSTH.py``: a strided ResBlock tower over
concat(stickman, rgb) per identity frame, spatial-sum features aggregated by
mean/max over frames.  No pose path — pose comes from landmarks via the FSTH/
FSTH_plus generator.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.nn.encoders import SumPoolEncoder


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--embed_padding", type=str, default="zero")
        parser.add("--embed_num_blocks", type=int, default=6)
        parser.add("--average_function", type=str, default="sum")

    @staticmethod
    def get_net(args):
        return Embedder(
            num_channels=args.num_channels,
            max_num_channels=args.max_num_channels,
            embed_channels=args.embed_channels,
            num_blocks=args.embed_num_blocks,
            padding=args.embed_padding,
            average_function=args.average_function,
        )


class Embedder(nn.Module):
    INPUT_KEYS = ("enc_rgbs", "pose_input_rgbs", "enc_stickmen")

    num_channels: int = 64
    max_num_channels: int = 512
    embed_channels: int = 512
    num_blocks: int = 6
    padding: str = "zero"
    average_function: str = "sum"
    use_stickmen: bool = True
    dtype: Any = None

    def setup(self):
        self.encoder = SumPoolEncoder(
            num_channels=self.num_channels,
            max_num_channels=self.max_num_channels,
            out_features=self.embed_channels,
            num_blocks=self.num_blocks, padding=self.padding)

    def get_identity_embedding(self, enc_rgbs, enc_stickmen=None,
                               train: bool = False):
        """enc_rgbs: (B, K, H, W, 3); enc_stickmen: same (required when
        use_stickmen)."""
        inputs = enc_rgbs
        if self.use_stickmen:
            assert enc_stickmen is not None, "FSTH embedder needs stickmen"
            inputs = jnp.concatenate([enc_stickmen, enc_rgbs], axis=-1)
        b, k = inputs.shape[:2]
        flat = inputs.reshape((b * k,) + inputs.shape[2:])
        pooled, _ = self.encoder(flat, update_stats=train)
        elemwise = pooled.reshape(b, k, self.embed_channels)
        if self.average_function == "sum":
            agg = elemwise.mean(axis=1)
        elif self.average_function == "max":
            agg = elemwise.max(axis=1)
        else:
            raise ValueError("average_function must be sum|max")
        return agg, elemwise

    def get_pose_embedding(self, pose_input_rgbs, train: bool = False):
        return None  # pose comes from landmarks (reference FSTH.py:95-96)

    def __call__(self, enc_rgbs, pose_input_rgbs=None, enc_stickmen=None,
                 train: bool = False, compute_identity: bool = True):
        if compute_identity:
            embeds, elemwise = self.get_identity_embedding(
                enc_rgbs, enc_stickmen, train)
        else:
            embeds, elemwise = None, None
        return embeds, elemwise, None
