"""Measure formulations of the decoder's final up-block (up256) on the TPU.

The flagship decoder's tail (128²x128 -> 256²x64 -> head) dominates drive
latency (up256 block: 34.3 ms of the 76 ms generator forward @ batch 128,
tools/bench_drive_tail.py).  Candidate fix: polyphase/space-to-depth — keep
the 2x-resolution tensor as 4 parity planes on the channel axis at 128²
(256 channels for the MXU instead of 64).  All formulations are EXACT
algebraic rewrites; this tool measures which to use.

Timing methodology: chained-in-jit (the ~1 ms axon dispatch must be
amortized) with a FULL-tensor sum as the loop carry — a sliced reducer lets
XLA push the slice through pure convs and dead-code-eliminate the work
(observed: a 1.24 TFLOP conv "measuring" 0.23 ms).  The carry is folded back
via ``x + carry * 1e-30`` so no iteration can be hoisted.

    python tools/bench_up256_variants.py [--batch 128]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHAIN = 20


def timeit(fn, iters=10):
    fn().block_until_ready()
    start = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    return (time.perf_counter() - start) / iters / CHAIN * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    cli = parser.parse_args()
    b = cli.batch
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    H, CIN, COUT = 128, 128, 64  # up256 geometry
    x = jax.random.normal(rng, (b, H, H, CIN), dt)
    x_s2d = jax.random.normal(rng, (b, H, H, 4 * COUT), dt)
    xf = jax.random.normal(rng, (b, 2 * H, 2 * H, COUT), dt)
    k0 = jax.random.normal(rng, (3, 3, CIN, COUT), dt) * 0.05
    k1 = jax.random.normal(rng, (3, 3, COUT, COUT), dt) * 0.05
    kh = jax.random.normal(rng, (3, 3, COUT, 4), dt) * 0.05

    def chain(fn, *example):
        # max-|.| reducer: a full-tensor pass that is NOT linearly separable,
        # so XLA can neither slice through the convs nor hoist the body.
        @jax.jit
        def run(*xs):
            def body(i, carry):
                out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
                return jnp.max(jnp.abs(out.astype(jnp.float32))) * 1e-30
            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))
        return timeit(lambda: run(*example), iters=cli.iters)

    dn = ("NHWC", "HWIO", "NHWC")

    # baseline: cost of the max-reducer itself on each tensor size
    print(f"batch={b} bf16; max-reducer baselines (1 full read):")
    print(f"  max 256²x64 (1.07 GB)    : {chain(lambda t: t, xf):7.3f} ms")
    print(f"  max 128²x256 (1.07 GB)   : {chain(lambda t: t, x_s2d):7.3f} ms")

    # ---- conv0 variants --------------------------------------------------
    from latentpose_tpu.ops.image import (upsample_nearest_2x,
                                          upsample2x_conv3x3)

    def conv0_A(x):
        return upsample2x_conv3x3(x, k0)

    def conv0_B(x):
        h = upsample_nearest_2x(x)
        return lax.conv_general_dilated(h, k0, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)

    def make_k3_up(k):
        """3x3 low-res kernel producing s2d channels ordered (py, px, o)."""
        r0 = jnp.stack([k[0], k[1] + k[2]], 0)          # (2, 3, C, O)
        r1 = jnp.stack([k[0] + k[1], k[2]], 0)

        def cols(r):
            q0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], 1)  # (2, 2, C, O)
            q1 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], 1)
            return q0, q1

        k00, k01 = cols(r0)
        k10, k11 = cols(r1)
        cin, cout = k.shape[2], k.shape[3]
        K = jnp.zeros((3, 3, cin, 2, 2, cout), k.dtype)
        # parity (py, px) sub-window inside the pad-1 3x3 window:
        # parity 0 -> rows 0:2, parity 1 -> rows 1:3 (same for columns)
        K = K.at[0:2, 0:2, :, 0, 0, :].set(k00)
        K = K.at[0:2, 1:3, :, 0, 1, :].set(k01)
        K = K.at[1:3, 0:2, :, 1, 0, :].set(k10)
        K = K.at[1:3, 1:3, :, 1, 1, :].set(k11)
        return K.reshape(3, 3, cin, 4 * cout)

    K3up = make_k3_up(k0)

    def conv0_C(x):
        return lax.conv_general_dilated(x, K3up, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)

    def d2s(y):
        bb, h, w, c4 = y.shape
        c = c4 // 4
        y = y.reshape(bb, h, w, 2, 2, c)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        return y.reshape(bb, 2 * h, 2 * w, c)

    def conv0_C_d2s(x):
        return d2s(conv0_C(x))

    print("up256 conv0 (up 2x + 3x3, 128ch -> 64ch; 1.24 TFLOP @ B=128):")
    print(f"  A 4-parity convs + stack : {chain(conv0_A, x):7.3f} ms")
    print(f"  B up-2x + conv at 256²   : {chain(conv0_B, x):7.3f} ms")
    print(f"  C one conv -> s2d        : {chain(conv0_C, x):7.3f} ms")
    print(f"  C' C + depth-to-space    : {chain(conv0_C_d2s, x):7.3f} ms")

    # numeric check: C == s2d(B)
    refB = conv0_B(x[:2].astype(jnp.float32).astype(dt))
    refB_s2d = refB.reshape(2, H, 2, H, 2, COUT)
    refB_s2d = jnp.transpose(refB_s2d, (0, 1, 3, 2, 4, 5)).reshape(
        2, H, H, 4 * COUT)
    errC = jnp.max(jnp.abs(refB_s2d.astype(jnp.float32)
                           - conv0_C(x[:2]).astype(jnp.float32)))
    print(f"  C parity check max|err| = {float(errC):.4f}")

    # ---- conv1 variants ----------------------------------------------------
    def conv1_D(xf):
        return lax.conv_general_dilated(xf, k1, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)

    def make_k2_s2d(k):
        """Dense 2x2 s2d-domain kernel for a full-res 3x3 conv.

        Input channels (qy, qx, i), output (py, px, o); parity p's low-res
        row window is {h-1, h} for p=0 and {h, h+1} for p=1 — one VALID 2x2
        conv over pad-1 input gives H+1 rows; p=0 reads rows [0:H], p=1
        rows [1:H+1].
        """
        cin, cout = k.shape[2], k.shape[3]
        taps = {0: [(0, 1, 0), (1, 0, 1), (1, 1, 2)],
                1: [(0, 0, 0), (0, 1, 1), (1, 0, 2)]}
        K = jnp.zeros((2, 2, 2, 2, cin, 2, 2, cout), k.dtype)
        # (ky, kx, qy, qx, i, py, px, o)
        for py, rowtaps in taps.items():
            for px, coltaps in taps.items():
                for (ky, qy, ay) in rowtaps:
                    for (kx, qx, ax) in coltaps:
                        K = K.at[ky, kx, qy, qx, :, py, px, :].set(
                            k[ay, ax])
        return K.reshape(2, 2, 4 * cin, 4 * cout)

    K2 = make_k2_s2d(k1)

    def conv1_E(xs):
        y = lax.conv_general_dilated(xs, K2, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=dn)  # (H+1, W+1)
        h = H
        p00 = y[:, :h, :h, 0 * COUT:1 * COUT]
        p01 = y[:, :h, 1:, 1 * COUT:2 * COUT]
        p10 = y[:, 1:, :h, 2 * COUT:3 * COUT]
        p11 = y[:, 1:, 1:, 3 * COUT:4 * COUT]
        return jnp.concatenate([p00, p01, p10, p11], axis=-1)

    print("up256 conv1 (3x3 64->64 at 256²; 0.62 TFLOP, 1.10 as s2d-dense):")
    print(f"  D plain conv at 256²     : {chain(conv1_D, xf):7.3f} ms")
    print(f"  E s2d dense 2x2 at 128²  : {chain(conv1_E, x_s2d):7.3f} ms")

    ref = conv1_D(d2s(x_s2d[:2]))
    ref_s2d = ref.reshape(2, H, 2, H, 2, COUT)
    ref_s2d = jnp.transpose(ref_s2d, (0, 1, 3, 2, 4, 5)).reshape(
        2, H, H, 4 * COUT)
    err = jnp.max(jnp.abs(ref_s2d.astype(jnp.float32)
                          - conv1_E(x_s2d[:2]).astype(jnp.float32)))
    print(f"  E parity check max|err| = {float(err):.4f}")

    # ---- adain + relu ------------------------------------------------------
    from latentpose_tpu.ops import norms as norm_ops
    from latentpose_tpu.ops.pallas.adain_fused import adain_fused
    w = jnp.full((b, COUT), 1.1, dt)
    bia = jnp.full((b, COUT), 0.1, dt)

    def ada_two_pass(xf):
        return jax.nn.relu(norm_ops.adain(xf, w, bia, 1e-4))

    def ada_one_pass(xf):
        x32 = xf.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2))
        meansq = jnp.mean(jnp.square(x32), axis=(1, 2))
        var = meansq - jnp.square(mean)
        scale = w.astype(jnp.float32) * lax.rsqrt(var + 1e-4)
        shift = bia.astype(jnp.float32) - mean * scale
        y = xf * scale[:, None, None, :].astype(dt) \
            + shift[:, None, None, :].astype(dt)
        return jax.nn.relu(y)

    def ada_pallas(xf):
        return adain_fused(xf, w, bia, relu=True)

    w4 = jnp.tile(w, (1, 4))
    b4 = jnp.tile(bia, (1, 4))

    def ada_s2d_one_pass(xs):
        x32 = xs.astype(jnp.float32).reshape(b, H, H, 4, COUT)
        mean = jnp.mean(x32, axis=(1, 2, 3))
        meansq = jnp.mean(jnp.square(x32), axis=(1, 2, 3))
        var = meansq - jnp.square(mean)
        scale = w.astype(jnp.float32) * lax.rsqrt(var + 1e-4)
        shift = bia.astype(jnp.float32) - mean * scale
        scale4 = jnp.tile(scale, (1, 4))[:, None, None, :].astype(dt)
        shift4 = jnp.tile(shift, (1, 4))[:, None, None, :].astype(dt)
        return jax.nn.relu(xs * scale4 + shift4)

    print("adain+relu (1.07 GB activation):")
    print(f"  two-pass XLA @ 256²x64   : {chain(ada_two_pass, xf):7.3f} ms")
    print(f"  one-pass XLA @ 256²x64   : {chain(ada_one_pass, xf):7.3f} ms")
    print(f"  pallas fused @ 256²x64   : {chain(ada_pallas, xf):7.3f} ms")
    print(f"  one-pass XLA s2d 128²x256: "
          f"{chain(ada_s2d_one_pass, x_s2d):7.3f} ms")
    err = jnp.max(jnp.abs(
        jax.nn.relu(norm_ops.adain(xf[:2], w[:2], bia[:2], 1e-4))
        .astype(jnp.float32)
        - adain_fused(xf[:2], w[:2], bia[:2], relu=True)
        .astype(jnp.float32)))
    print(f"  pallas-vs-XLA check max|err| = {float(err):.4f}")

    # ---- head conv -----------------------------------------------------
    K2h = make_k2_s2d(kh)

    def head_full(xf):
        return lax.conv_general_dilated(xf, kh, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)

    def head_s2d(xs):
        y = lax.conv_general_dilated(xs, K2h, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=dn)
        h = H
        p00 = y[:, :h, :h, 0:4]
        p01 = y[:, :h, 1:, 4:8]
        p10 = y[:, 1:, :h, 8:12]
        p11 = y[:, 1:, 1:, 12:16]
        return d2s(jnp.concatenate([p00, p01, p10, p11], axis=-1))

    print("head conv (64->4):")
    print(f"  full res at 256²         : {chain(head_full, xf):7.3f} ms")
    print(f"  s2d + tiny d2s           : {chain(head_s2d, x_s2d):7.3f} ms")

    # ---- composed block: conv0+ada+conv1(+skip) full-res vs s2d ---------
    ks = jax.random.normal(rng, (1, 1, CIN, COUT), dt) * 0.05

    def block_full(x):
        h = conv0_B(x)
        h = ada_two_pass(h)
        h = conv1_D(h)
        s = lax.conv_general_dilated(x, ks, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn)
        return h + upsample_nearest_2x(s)

    def block_s2d(x):
        h = conv0_C(x)
        h = ada_s2d_one_pass(h)
        h = conv1_E(h)
        s = lax.conv_general_dilated(x, ks, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn)
        return h + jnp.tile(s, (1, 1, 1, 4))  # nearest-up in s2d = tile
    print("composed up256 block (conv0+adain+conv1+skip):")
    print(f"  full-res formulation     : {chain(block_full, x):7.3f} ms")
    print(f"  s2d formulation          : {chain(block_s2d, x):7.3f} ms")


if __name__ == "__main__":
    main()
