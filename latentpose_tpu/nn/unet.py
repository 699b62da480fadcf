"""Compact pix2pix-style UNet used by the X2Face reproduction.

X2Face (Wiles et al. 2018) is two UNets: an *embedding* network mapping
identity frames to an embedded face, and a *driving* network mapping the
driver frame (conditioned on the embedded face) to a dense sampling grid
that warps the embedded face.  The reference consumes the original authors'
pretrained torch model as a frozen black box (``generators/X2Face.py``,
``embedders/X2Face_pretrained_embResNeXt.py``); here the same architecture
family is implemented natively and weight-gated.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class UNet(nn.Module):
    """Encoder-decoder with skip connections.

    ``bottleneck_size``: if set, also returns the flattened bottleneck
    (X2Face's "latent pose vector" comes from the driving UNet bottleneck).
    """

    out_features: int
    widths: Sequence[int] = (64, 128, 256, 512, 512)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, return_bottleneck: bool = False):
        skips = []
        h = x
        for i, width in enumerate(self.widths):
            h = nn.Conv(width, (4, 4), strides=(2, 2), padding=1,
                        name=f"down{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            skips.append(h)
        bottleneck = h

        for i, width in enumerate(reversed(self.widths[:-1])):
            h = jax.image.resize(
                h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]),
                "nearest")
            h = nn.Conv(width, (3, 3), padding=1, name=f"up{i}")(h)
            h = nn.relu(h)
            skip = skips[len(self.widths) - 2 - i]
            h = jnp.concatenate([h, skip], axis=-1)
        h = jax.image.resize(
            h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]),
            "nearest")
        out = nn.Conv(self.out_features, (3, 3), padding=1, name="head")(h)
        if return_bottleneck:
            return out, bottleneck
        return out
