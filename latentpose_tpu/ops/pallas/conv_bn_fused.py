"""Fused BN-apply -> ReLU -> 1x1 conv -> BN-stats Pallas TPU kernel (probe).

The ResNeXt-50 identity tower (the meta-train step's largest cost,
tools/bench_train_parts.py) alternates 1x1 convolutions with train-mode
BatchNorm + ReLU.  In XLA each BN link costs, per activation tensor, a
stats read + a normalize read + a normalize write on top of the conv's own
read/write.  A 1x1 conv is a plain (N*H*W, Cin) @ (Cin, Cout) matmul, so the
whole link fuses into ONE kernel:

    y = relu(x * scale + offset) @ W        (scale/offset fold mean/var/γ/β)
    stats = (Σ y, Σ y²) per channel         (the NEXT BN's batch statistics)

HBM traffic per link: read x + read W + write y — the 2-sweep floor — vs
XLA's ~4 sweeps (normalize read/write + conv read... XLA does fuse some of
this; the honest comparison is tools/bench_conv_bn_fusion.py).

Status: FORWARD-ONLY measurement probe for the adopt/reject decision on the
round-3 "attack the tower" item; the training step needs a custom VJP
(BN backward reductions + ReLU mask + matmul grads) before production use.
Reference capability at stake: the meta-train step of
``/root/reference/train.py:97-211`` with ``configs/default.yaml:19-20``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, offset_ref, w_ref, y_ref, stats_ref, acc_ref,
            *, relu, num_steps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)                       # (MT, Cin)
    x = x * scale_ref[0, :] + offset_ref[0, :]
    if relu:
        x = jnp.maximum(x, 0.0)
    y = jnp.dot(x.astype(w_ref.dtype), w_ref[:],
                preferred_element_type=jnp.float32)        # (MT, Cout)
    y_ref[:] = y.astype(y_ref.dtype)
    acc_ref[0, :] += jnp.sum(y, axis=0)
    acc_ref[1, :] += jnp.sum(y * y, axis=0)

    @pl.when(i == num_steps - 1)
    def _():
        stats_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("relu", "m_tile"))
def bn_relu_conv1x1_stats(x, scale, offset, w, relu: bool = True,
                          m_tile: int = 512):
    """x: (..., Cin) with leading dims flattened to M; scale/offset: (Cin,)
    f32 (fold BN mean/var/gamma/beta via ``fold_bn``); w: (Cin, Cout).

    Returns (y (..., Cout), stats (2, Cout) f32) where stats[0] = Σy,
    stats[1] = Σy² over all M rows — the next BatchNorm's batch statistics.
    """
    lead = x.shape[:-1]
    cin = x.shape[-1]
    cout = w.shape[-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, cin)
    while m % m_tile:
        m_tile //= 2
    num_steps = m // m_tile

    y, stats = pl.pallas_call(
        functools.partial(_kernel, relu=relu, num_steps=num_steps),
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((m_tile, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m_tile, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, cout), x.dtype),
            jax.ShapeDtypeStruct((2, cout), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, cout), jnp.float32)],
    )(x2, scale.reshape(1, cin).astype(jnp.float32),
      offset.reshape(1, cin).astype(jnp.float32), w)
    return y.reshape(*lead, cout), stats


def fold_bn(mean, var, gamma, beta, eps=1e-5):
    """BN(x) = x*scale + offset with scale/offset precomputed per channel."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale
