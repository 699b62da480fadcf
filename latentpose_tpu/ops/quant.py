"""Dynamic int8 quantization for the inference (drive) hot path.

The v5e MXU runs int8 x int8 -> int32 convolutions at ~2x bf16 throughput
(measured on the decoder's conv geometries: 1.55-1.92x,
tools/bench_int8_conv.py), and int8 activations halve HBM traffic.  The
drive decoder is MXU/bandwidth-bound, so an opt-in quantized path is the
TPU-native answer to "production serving throughput" — the reference
has no analog (its drive loop is fp32 batch-1 python,
``/root/reference/drive.py:84-98``).

Scheme (no calibration pass needed):
- activations: dynamic symmetric per-tensor scale ``max|x| / 127``,
  computed per call.  Decoder activations are AdaIN-normalized per sample,
  so a per-tensor scale loses little, and the absmax reduce fuses into the
  producer's epilogue.
- weights: symmetric per-output-channel scales (after spectral-norm sigma
  scaling, which is static at inference).  Quantization error is bounded
  per channel, and the rescale folds into the conv epilogue together with
  the activation scale.

Training and the exactness-gated paths never import this module; the drive
CLI enables it with ``--quantize int8``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def quantize_dynamic(x):
    """x (any float dtype) -> (int8 tensor, f32 scalar scale)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def quantize_kernel_per_channel(kernel):
    """HWIO float kernel -> (int8 kernel, f32 per-out-channel scales)."""
    k32 = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k32), axis=(0, 1, 2))            # (C_out,)
    scales = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(k32 / scales), -127.0, 127.0)
    return q.astype(jnp.int8), scales


def conv2d_int8(x, kernel, strides=(1, 1), padding=((1, 1), (1, 1)),
                out_dtype=jnp.bfloat16):
    """Quantized NHWC conv: float in, float out, int8 x int8 -> int32 MXU.

    x: (B, H, W, C) float; kernel: (kh, kw, C, C') float.  The result is
    ``conv(x, kernel)`` up to symmetric-quantization rounding error.
    """
    xq, sx = quantize_dynamic(x)
    kq, sk = quantize_kernel_per_channel(kernel)
    y = lax.conv_general_dilated(
        xq, kq, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sk)).astype(out_dtype)
