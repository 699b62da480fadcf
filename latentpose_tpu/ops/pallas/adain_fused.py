"""Fused AdaIN (+optional ReLU) Pallas TPU kernel.

The generator applies instance-norm + per-sample affine (+ReLU) 17 times per
image (two per ResBlock + the head — reference
``generators/...noBottleneck.py``, ``blocks.py:6-26``).  Each application is
pure HBM bandwidth over the full (B, H, W, C) activation.  This kernel fuses
the whole chain into one pallas_call with a two-phase sequential grid:

    grid = (B, C/CT, 2 phases, H/HC)

Phase 0 streams the (HC, W, CT) chunks and accumulates per-channel sum and
sum-of-squares in VMEM scratch (which persists across grid steps); phase 1
re-streams the chunks and writes ``(x - mean) * rsqrt(var + eps) * weight +
bias`` (optionally ReLU'd).  Total HBM traffic: 2 reads + 1 write, with no
intermediate materialization and float32 statistics regardless of the
activation dtype.

Used on the inference hot path (drive); training uses the differentiable XLA
version in ops/norms.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adain_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, eps, relu,
                  num_pixels, c_tile):
    phase = pl.program_id(2)
    h_idx = pl.program_id(3)

    @pl.when(jnp.logical_and(phase == 0, h_idx == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        chunk = x_ref[0].astype(jnp.float32)          # (HC, W, CT)
        acc_ref[0, :] += jnp.sum(chunk, axis=(0, 1))
        acc_ref[1, :] += jnp.sum(chunk * chunk, axis=(0, 1))

    @pl.when(phase == 1)
    def _():
        n = jnp.float32(num_pixels)
        mean = acc_ref[0, :] / n
        var = acc_ref[1, :] / n - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        scale = inv * w_ref[0, 0, :].astype(jnp.float32)
        offset = b_ref[0, 0, :].astype(jnp.float32) - mean * scale
        out = x_ref[0].astype(jnp.float32) * scale[None, None, :] \
            + offset[None, None, :]
        if relu:
            out = jnp.maximum(out, 0.0)
        o_ref[0] = out.astype(o_ref.dtype)


def _pick_tiles(h, w, c, itemsize):
    c_tile = min(c, 128)
    while c % c_tile:
        c_tile //= 2
    # per-chunk VMEM budget: in + out blocks are double-buffered, and v5e
    # enforces a 16 MiB scoped-vmem stack limit — a 2 MiB chunk (= 16 MiB
    # total with buffering + scratch) OOMs at the flagship 256²x64 shape,
    # so stay at 1 MiB (measured working on v5e, tools/bench_up256_variants)
    budget = 1024 * 1024
    h_chunk = max(1, min(h, budget // max(1, w * c_tile * itemsize)))
    while h % h_chunk:
        h_chunk -= 1
    return c_tile, h_chunk


@functools.partial(jax.jit, static_argnames=("eps", "relu"))
def adain_fused(x, weight, bias, eps: float = 1e-4, relu: bool = False):
    """x: (B, H, W, C); weight/bias: (B, C).  IN(x)*weight + bias [+ReLU].

    Numerics match ops/norms.adain (float32 biased-variance statistics).
    """
    b, h, w, c = x.shape
    c_tile, h_chunk = _pick_tiles(h, w, c, x.dtype.itemsize)
    grid = (b, c // c_tile, 2, h // h_chunk)

    def x_index(i, j, p, k):
        return (i, k, 0, j)

    def wb_index(i, j, p, k):
        return (i, 0, j)

    # weight/bias are tiny (B, C); Mosaic requires (8, 128)-aligned blocks
    # and rejects dynamic sublane loads, so broadcast them to (B, 8, C) and
    # give each program a legal (1, 8, CT) tile.
    w8 = jnp.broadcast_to(weight[:, None, :], (b, 8, c))
    b8 = jnp.broadcast_to(bias[:, None, :], (b, 8, c))

    return pl.pallas_call(
        functools.partial(_adain_kernel, eps=eps, relu=relu,
                          num_pixels=h * w, c_tile=c_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h_chunk, w, c_tile), x_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c_tile), wb_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c_tile), wb_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_chunk, w, c_tile), x_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((2, c_tile), jnp.float32)],
    )(x, w8, b8)
