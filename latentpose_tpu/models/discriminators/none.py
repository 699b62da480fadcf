"""No-op discriminator (reference ``discriminators/none.py``) — for
reproductions that train without an adversarial loss (X2Face)."""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn
import optax


class Wrapper:
    @staticmethod
    def get_args(parser):
        return parser

    @staticmethod
    def get_net(args):
        return Discriminator()

    @staticmethod
    def get_optimizer(args):
        # reference returns None; optax equivalent: a do-nothing transform
        return optax.set_to_zero()


class Discriminator(nn.Module):
    @staticmethod
    def make_input(batch, rgbs):
        return rgbs if rgbs.ndim == 4 else rgbs[:, 0]

    def setup(self):
        pass

    def pass_inputs(self, x, embed=None, update_stats: bool = False):
        return jnp.zeros((x.shape[0],), jnp.float32), []

    def embed_labels(self, labels, update_stats: bool = False):
        return None

    def __call__(self, x, labels=None, update_stats: bool = False):
        return self.pass_inputs(x)
