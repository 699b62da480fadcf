"""X2Face passthrough embedder (reference ``embedders/X2Face.py``): a no-op
— the X2Face generator is self-contained (consumes enc_rgbs + driver
directly)."""

from __future__ import annotations

import flax.linen as nn


class Wrapper:
    @staticmethod
    def get_args(parser):
        return parser

    @staticmethod
    def get_net(args):
        return Embedder()


class Embedder(nn.Module):
    INPUT_KEYS = ("enc_rgbs", "pose_input_rgbs")

    def setup(self):
        pass

    def get_identity_embedding(self, enc_rgbs, train: bool = False):
        return None, None

    def get_pose_embedding(self, pose_input_rgbs, train: bool = False):
        return None

    def __call__(self, enc_rgbs, pose_input_rgbs=None, train: bool = False,
                 compute_identity: bool = True):
        return None, None, None
