"""Plain L1 RGB loss (reference ``criterions/l1_rgb.py``; off by default)."""

from __future__ import annotations

import jax.numpy as jnp


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--l1_weight", type=float, default=30.0)

    @staticmethod
    def get_net(args):
        return Criterion(args.l1_weight)


class Criterion:
    def __init__(self, weight):
        self.weight = float(weight)

    def __call__(self, data_dict):
        fake_rgb = data_dict["fake_rgbs"]
        real_rgb = data_dict["target_rgbs"]
        if real_rgb.ndim > 4:
            real_rgb = real_rgb[:, 0]
        loss = self.weight * jnp.mean(jnp.abs(fake_rgb - real_rgb))
        return {"l1_rgb": loss}
