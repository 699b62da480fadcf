"""Block library — TPU-native equivalent of the reference's
``generators/common/blocks.py``.

Differences by design (not omissions):
- AdaIN (weight, bias) are *call arguments* rather than imperatively assigned
  module state (reference ``blocks.py:6-26``'s assign/delete dance exists only
  to save GPU memory under autograd; XLA needs neither).
- NHWC layout; spectral norm carries its power-iteration state in the
  "spectral" flax collection (see ops/spectral_norm.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.ops import norms as norm_ops
from latentpose_tpu.ops.image import (avg_pool_2x, depth_to_space,
                                      upsample_nearest_2x)
from latentpose_tpu.ops.spectral_norm import SNConv

AdaParams = Tuple[jnp.ndarray, jnp.ndarray]  # (weight, bias), each (B, C)


def _reflect_pad_1(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


class InstanceNormAffine(nn.Module):
    """InstanceNorm2d(affine=True, eps=1e-4) parity (weight=1, bias=0 init)."""

    features: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return norm_ops.instance_norm_affine(x, weight, bias, self.eps)


class ResBlock(nn.Module):
    """Pre-activation residual block (reference ``blocks.py:47-111``).

    main: [norm0] -> ReLU -> [up x2] -> SNConv3x3 -> [norm1] -> ReLU
          -> SNConv3x3 -> [down avgpool2]
    skip (if in!=out or up or down): [up x2] -> SNConv1x1(bias) -> [down]

    ``norm_layer``: 'none' | 'in' | 'adain'.  Conv biases are disabled when a
    norm is present (reference: ``bias = not normalize``).
    With 'adain', per-sample (weight, bias) pairs for the two norms come in as
    call arguments.
    """

    in_features: int
    out_features: int
    norm_layer: str = "none"          # 'none' | 'in' | 'adain'
    upsample: bool = False
    downsample: bool = False
    padding: str = "zero"             # 'zero' | 'reflection'
    eps: float = 1e-4
    quantize: bool = False            # int8 inference path (ops/quant.py)

    @nn.compact
    def __call__(self, x, ada0: Optional[AdaParams] = None,
                 ada1: Optional[AdaParams] = None,
                 update_stats: bool = False):
        normalize = self.norm_layer != "none"
        conv_bias = not normalize
        conv_padding = 1 if self.padding == "zero" else 0

        def maybe_pad(h):
            return _reflect_pad_1(h) if self.padding == "reflection" else h

        h = x
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.in_features, self.eps, name="norm0")(h)
        elif self.norm_layer == "adain":
            assert ada0 is not None, "adain ResBlock needs ada0=(weight, bias)"
            h = norm_ops.adain(h, ada0[0], ada0[1], self.eps)

        h = nn.relu(h)
        if self.upsample and self.padding == "zero" \
                and self.norm_layer == "adain":
            # fused sub-pixel upsample+conv emitting the space-to-depth
            # form, with AdaIN+ReLU applied in the s2d domain (exact) and a
            # single-consumer interleave afterwards.  Keeping norm1's two
            # passes off the interleaved layout is worth ~8.5 ms of the
            # up256 block's 32 ms @ batch 128 (tools/bench_block_pieces.py).
            assert ada1 is not None, "adain ResBlock needs ada1=(weight, bias)"
            h = SNConv(self.out_features, (3, 3), padding=1,
                       use_bias=conv_bias, upsample_2x=True,
                       s2d_output=True, quantize=self.quantize,
                       name="conv0")(h, update_stats)
            h = norm_ops.adain_s2d(h, ada1[0], ada1[1], self.eps)
            h = nn.relu(h)
            h = depth_to_space(h, self.out_features)
        else:
            if self.upsample and self.padding == "zero":
                # fused sub-pixel upsample+conv: exact, never materializes
                # the nearest-upsampled input tensor
                h = SNConv(self.out_features, (3, 3), padding=1,
                           use_bias=conv_bias, upsample_2x=True,
                           quantize=self.quantize,
                           name="conv0")(h, update_stats)
            else:
                if self.upsample:
                    h = upsample_nearest_2x(h)
                h = SNConv(self.out_features, (3, 3), padding=conv_padding,
                           use_bias=conv_bias, quantize=self.quantize,
                           name="conv0")(maybe_pad(h), update_stats)

            if self.norm_layer == "in":
                h = InstanceNormAffine(self.out_features, self.eps,
                                       name="norm1")(h)
            elif self.norm_layer == "adain":
                assert ada1 is not None, \
                    "adain ResBlock needs ada1=(weight, bias)"
                h = norm_ops.adain(h, ada1[0], ada1[1], self.eps)

            h = nn.relu(h)
        h = SNConv(self.out_features, (3, 3), padding=conv_padding,
                   use_bias=conv_bias, quantize=self.quantize,
                   name="conv1")(maybe_pad(h), update_stats)
        if self.downsample:
            h = avg_pool_2x(h)

        needs_skip = (self.in_features != self.out_features or self.upsample
                      or self.downsample)
        if needs_skip:
            s = x
            # 1x1 conv commutes with nearest upsampling: convolve at the
            # low resolution, then upsample the (usually narrower) result
            s = SNConv(self.out_features, (1, 1), padding=0, use_bias=True,
                       quantize=self.quantize, name="skip")(s, update_stats)
            if self.upsample:
                s = upsample_nearest_2x(s)
            if self.downsample:
                s = avg_pool_2x(s)
            return h + s
        return h + x


def channel_shuffle(x, groups: int):
    """ShuffleNet channel shuffle (reference ``blocks.py:113-136``), NHWC."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class ResBlockNoSpectralNorm(nn.Module):
    """ResBlock variant without spectral norm (reference
    ``blocks.py:455-522``; unused by the flagship)."""

    in_features: int
    out_features: int
    norm_layer: str = "none"
    upsample: bool = False
    downsample: bool = False
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, ada0=None, ada1=None, update_stats: bool = False):
        normalize = self.norm_layer != "none"
        h = x
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.in_features, self.eps,
                                   name="norm0")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada0[0], ada0[1], self.eps)
        h = nn.relu(h)
        if self.upsample:
            h = upsample_nearest_2x(h)
        h = nn.Conv(self.out_features, (3, 3), padding=1,
                    use_bias=not normalize, name="conv0")(h)
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.out_features, self.eps,
                                   name="norm1")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada1[0], ada1[1], self.eps)
        h = nn.relu(h)
        h = nn.Conv(self.out_features, (3, 3), padding=1,
                    use_bias=not normalize, name="conv1")(h)
        if self.downsample:
            h = avg_pool_2x(h)
        if (self.in_features != self.out_features or self.upsample
                or self.downsample):
            s = upsample_nearest_2x(x) if self.upsample else x
            s = nn.Conv(self.out_features, (1, 1), name="skip")(s)
            if self.downsample:
                s = avg_pool_2x(s)
            return h + s
        return h + x


class GatedBlock(nn.Module):
    """Gated conv block (reference ``blocks.py:372-452``): conv output split
    into (features, gate), output = features * sigmoid(gate)."""

    out_features: int
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        h = SNConv(self.out_features * 2, self.kernel_size, padding=1,
                   name="conv")(x, update_stats)
        feat, gate = jnp.split(h, 2, axis=-1)
        return feat * nn.sigmoid(gate)


class GatedResBlock(nn.Module):
    """Residual block of two GatedBlocks (reference ``blocks.py:421-452``)."""

    in_features: int
    out_features: int
    upsample: bool = False
    downsample: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        h = nn.relu(x)
        if self.upsample:
            h = upsample_nearest_2x(h)
        h = GatedBlock(self.out_features, name="gated0")(h, update_stats)
        h = nn.relu(h)
        h = GatedBlock(self.out_features, name="gated1")(h, update_stats)
        if self.downsample:
            h = avg_pool_2x(h)
        if (self.in_features != self.out_features or self.upsample
                or self.downsample):
            s = upsample_nearest_2x(x) if self.upsample else x
            s = SNConv(self.out_features, (1, 1), padding=0,
                       name="skip")(s, update_stats)
            if self.downsample:
                s = avg_pool_2x(s)
            return h + s
        return h + x


class MobileNetBlock(nn.Module):
    """Depthwise-separable residual block (reference ``blocks.py:525-586``)."""

    in_features: int
    out_features: int
    expansion: int = 6

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        hidden = self.in_features * self.expansion
        h = nn.Conv(hidden, (1, 1), name="expand")(x)
        h = nn.relu6(h)
        h = nn.Conv(hidden, (3, 3), padding=1, feature_group_count=hidden,
                    name="depthwise")(h)
        h = nn.relu6(h)
        h = nn.Conv(self.out_features, (1, 1), name="project")(h)
        if self.in_features == self.out_features:
            return x + h
        return h


class SelfAttention(nn.Module):
    """SAGAN-style self-attention (reference ``blocks.py:589-609``).

    Unused by the flagship config; provided for parity with the block library.
    """

    features: int

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        b, h, w, c = x.shape
        f = SNConv(c // 8, (1, 1), padding=0, name="f")(x, update_stats)
        g = SNConv(c // 8, (1, 1), padding=0, name="g")(x, update_stats)
        v = SNConv(c, (1, 1), padding=0, name="h")(x, update_stats)
        fq = f.reshape(b, h * w, c // 8)
        gq = g.reshape(b, h * w, c // 8)
        vq = v.reshape(b, h * w, c)
        attn = nn.softmax(jnp.einsum("bic,bjc->bij", fq, gq,
                                     preferred_element_type=jnp.float32),
                          axis=-1)
        out = jnp.einsum("bij,bjc->bic", attn.astype(vq.dtype), vq)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + gamma * out.reshape(b, h, w, c)
