"""Embedding-matching loss (reference ``criterions/dis_embed.py``):
L1 between the embedder's per-frame identity embedding (frame 0) and the
discriminator's stop-gradiented projection row W[label] — couples the two
embedding spaces, making W a valid identity-embedding init for fine-tuning."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--dis_embed_weight", type=float, default=1e-2)

    @staticmethod
    def get_net(args):
        return Criterion(args.dis_embed_weight)


class Criterion:
    def __init__(self, dis_embed_weight):
        self.weight = float(dis_embed_weight)

    def __call__(self, data_dict):
        fake_embed = data_dict["embeds_elemwise"]
        real_embed = data_dict["real_embedding"]
        if fake_embed.ndim > 2:
            fake_embed = fake_embed[:, 0]
        if real_embed.ndim > 2:
            real_embed = real_embed[:, 0]
        loss = jnp.mean(jnp.abs(
            fake_embed - jax.lax.stop_gradient(real_embed))) * self.weight
        return {"embedding_matching": loss}
