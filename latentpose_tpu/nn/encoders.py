"""Shared downsampling encoder tower (stem + strided no-norm ResBlocks with
spatial sum-pool head) — the structure the reference reuses across the FSTH
embedder (``embedders/FSTH.py:36-62``), no-pose embedder, and both
discriminators."""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.nn.blocks import ResBlock
from latentpose_tpu.ops.image import avg_pool_2x
from latentpose_tpu.ops.spectral_norm import SNConv


class SumPoolEncoder(nn.Module):
    """stem(conv-relu-conv-avgpool + 1x1 skip) -> (num_blocks-1) strided
    ResBlocks (last widens to out_features) -> relu -> spatial sum.

    Returns (features (B, out_features), feature maps list).
    """

    num_channels: int = 64
    max_num_channels: int = 512
    out_features: int = 512
    num_blocks: int = 6
    padding: str = "zero"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        h = SNConv(self.num_channels, (3, 3), padding=1, use_bias=True,
                   name="stem_conv0")(x, update_stats)
        h = nn.relu(h)
        h = SNConv(self.num_channels, (3, 3), padding=1, use_bias=True,
                   name="stem_conv1")(h, update_stats)
        h = avg_pool_2x(h)
        s = SNConv(self.num_channels, (1, 1), padding=0, use_bias=True,
                   name="stem_skip")(x, update_stats)
        s = avg_pool_2x(s)
        out = h + s

        feats: List[jnp.ndarray] = [out]
        in_ch = self.num_channels
        # reference FSTH.py:55-60: blocks 1..num_blocks-2 double channels,
        # final block widens to out_features; all strided
        for i in range(1, self.num_blocks - 1):
            out_ch = min(in_ch * 2, self.max_num_channels)
            out = ResBlock(in_ch, out_ch, norm_layer="none", downsample=True,
                           padding=self.padding,
                           name=f"block{i}")(out, update_stats=update_stats)
            feats.append(out)
            in_ch = out_ch
        out = ResBlock(in_ch, self.out_features, norm_layer="none",
                       downsample=True, padding=self.padding,
                       name=f"block{self.num_blocks - 1}")(
            out, update_stats=update_stats)
        feats.append(out)

        out = nn.relu(out)
        pooled = out.reshape(out.shape[0], -1, self.out_features).sum(axis=1)
        return pooled, feats
