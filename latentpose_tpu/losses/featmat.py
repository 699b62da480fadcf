"""Discriminator feature-matching loss (reference ``criterions/featmat.py``):
mean over blocks of mean-|fake_feat - stop_grad(real_feat)|, x fm_weight."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--fm_weight", type=float, default=10.0)

    @staticmethod
    def get_net(args):
        return Criterion(args.fm_weight)


class Criterion:
    def __init__(self, fm_weight):
        self.fm_weight = float(fm_weight)

    def __call__(self, data_dict):
        fake_feats = data_dict["fake_features"]
        real_feats = data_dict["real_features"]
        loss = 0.0
        for f, r in zip(fake_feats, real_feats):
            loss = loss + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
        loss = loss / len(fake_feats) * self.fm_weight
        return {"feature_matching": loss}
