"""Normalization ops: instance norm + AdaIN (adaptive instance norm).

The reference's AdaptiveNorm2d (``generators/common/blocks.py:6-26``) is
InstanceNorm2d(affine=False, eps=1e-4) followed by a per-sample, per-channel
affine whose (weight, bias) are *assigned from outside* right before the
forward.  In JAX we simply pass (weight, bias) as arguments — the reference's
imperative assign-and-delete memory hack is unnecessary under XLA.

All ops are NHWC (TPU-native layout).  XLA fuses the mean/var/normalize/affine
chain into the surrounding convolutions; a Pallas fusion for the full
instance-norm + affine + ReLU sequence lives in ``ops/pallas/adain_fused.py``
and is used on the inference hot path.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def instance_norm(x, eps: float = 1e-4):
    """InstanceNorm2d(affine=False) parity: per-(sample, channel) over H, W.

    Biased variance, like torch instance norm. x: (B, H, W, C).

    One-pass moments (E[x²] − E[x]²): both reductions read x once and XLA
    fuses them into a single sweep, vs the centered two-pass form which
    costs an extra full pass over the activation.  Measured at the
    decoder-tail scale (256²x64, batch 128, v5e): 3.0 ms vs 4.4 ms
    (tools/bench_up256_variants.py).  For unit-scale GAN activations in
    float32 accumulation the cancellation error is ~1e-6 relative — far
    inside the golden-parity tolerances.

    Input-scale assumption: the one-pass form loses precision when
    |mean| >> std (catastrophic cancellation in E[x²] − E[x]²).  All
    in-tree callers feed unit-scale activations; a future caller with
    large-mean/small-variance tensors should center first
    (``x - x.mean()``) or use a two-pass variance.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    meansq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def adain(x, weight, bias, eps: float = 1e-4):
    """Adaptive instance norm: IN(x) * weight + bias.

    x: (B, H, W, C); weight, bias: (B, C) — per-sample affine produced by the
    generator's projector MLP (reference ``generators/...noBottleneck.py:
    108-125``: bias comes first in the packed affine-params vector).
    """
    y = instance_norm(x, eps)
    return y * weight[:, None, None, :].astype(y.dtype) \
        + bias[:, None, None, :].astype(y.dtype)


def adain_s2d(y, weight, bias, eps: float = 1e-4):
    """AdaIN applied in the space-to-depth domain — exact.

    y: (B, H, W, 4*C) with channels ordered (py, px, c), i.e. the output of
    ``ops.image.upsample2x_conv3x3_s2d``; weight, bias: (B, C).

    Instance-norm statistics are per (sample, channel) over ALL pixels of
    the 2x-resolution image; in the s2d layout those pixels live in the 4
    parity planes of each channel, so reducing over (H, W, parity) gives
    bit-identical statistics up to float reduction order.  Doing the norm
    BEFORE the depth-to-space interleave keeps every pass over the tensor
    in the MXU/VPU-friendly (H, W, 4C) layout and leaves the interleave a
    single-consumer copy (see ops/image.upsample2x_conv3x3_s2d docstring).
    """
    b, h, w, c4 = y.shape
    c = c4 // 4
    y32 = y.astype(jnp.float32).reshape(b, h, w, 4, c)
    mean = jnp.mean(y32, axis=(1, 2, 3))                       # (B, C)
    meansq = jnp.mean(jnp.square(y32), axis=(1, 2, 3))
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    scale = weight.astype(jnp.float32) * lax.rsqrt(var + eps)  # (B, C)
    shift = bias.astype(jnp.float32) - mean * scale
    scale4 = jnp.tile(scale, (1, 4))[:, None, None, :]
    shift4 = jnp.tile(shift, (1, 4))[:, None, None, :]
    return y * scale4.astype(y.dtype) + shift4.astype(y.dtype)


def instance_norm_affine(x, weight, bias, eps: float = 1e-4):
    """InstanceNorm2d(affine=True) parity: shared (C,) scale/offset."""
    y = instance_norm(x, eps)
    return y * weight[None, None, None, :].astype(y.dtype) \
        + bias[None, None, None, :].astype(y.dtype)
