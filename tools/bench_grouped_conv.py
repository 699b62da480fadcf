"""Measure ResNeXt grouped-conv formulations on the real TPU chip.

STATUS r1 flagged the 32-group 3x3 convs as the meta-train bottleneck: with
4-32 channels per group the per-group contractions starve the 128x128 MXU.
This microbench times exact-math alternatives per ResNeXt-50 stage so the
winner can back ``ops/grouped_conv.py`` (VERDICT r1 item 3: "evaluate
einsum-batched grouped matmuls / space-to-depth" — measured, not guessed).

Formulations (all numerically exact, same weights layout HWIO):
  grouped   - XLA native feature_group_count (what flax nn.Conv emits)
  blockdiag - ONE dense conv with a block-diagonal kernel (G x FLOPs but
              full MXU lanes; zeros off-diagonal)
  batched   - im2col + einsum with G as a batch dim ('bmgk,gkn->bmgn')

Run:  python tools/bench_grouped_conv.py [--batch 8] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

# ResNeXt-50 32x4d stage shapes at 256^2 input (after stem /4):
# (spatial, width, stride) for the 3x3 grouped conv of each stage's blocks.
STAGES = [
    ("stage1", 64, 128, 1),
    ("stage2", 32, 256, 1),
    ("stage3", 16, 512, 1),
    ("stage4", 8, 1024, 1),
]
GROUPS = 32


def timeit(fn, iters=30):
    """fn is jitted and internally loops CHAIN times (dispatch latency
    through the axon tunnel is ~1 ms — it must be amortized inside jit)."""
    fn().block_until_ready()  # warmup/compile
    start = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    return (time.perf_counter() - start) / iters / CHAIN * 1e3  # ms/op


CHAIN = 50


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    def grouped_once(x, w, groups):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn,
                                        feature_group_count=groups)

    def blockdiag_once(x, w_dense):
        return lax.conv_general_dilated(x, w_dense, (1, 1), "SAME",
                                        dimension_numbers=dn)

    def batched_einsum_once(x, w):
        # x: (B, H, W, C); w: (3, 3, Cg, C) grouped-HWIO.
        b, h, wd, c = x.shape
        cg = w.shape[2]
        g = c // cg
        # im2col: 9 shifted copies -> (B, H, W, 9, C)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        patches = jnp.stack(
            [xp[:, dy:dy + h, dx:dx + wd, :] for dy in range(3)
             for dx in range(3)], axis=3)
        patches = patches.reshape(b, h, wd, 9, g, cg)
        wk = w.reshape(9, cg, g, c // g)
        return jnp.einsum("bhwkgc,kcgn->bhwgn", patches, wk,
                          preferred_element_type=x.dtype
                          ).reshape(b, h, wd, c)

    def chained(once, *consts):
        """CHAIN sequential applications inside one XLA program (the
        conv preserves shape, so x = op(x) chains)."""
        def body(i, x):
            return once(x, *consts)
        return jax.jit(lambda x: lax.fori_loop(0, CHAIN, body, x))

    @functools.partial(jax.jit, static_argnums=(2,))
    def conv_grouped(x, w, groups):
        return grouped_once(x, w, groups)

    @jax.jit
    def conv_blockdiag(x, w_dense):
        return blockdiag_once(x, w_dense)

    @jax.jit
    def conv_batched_einsum(x, w):
        return batched_einsum_once(x, w)

    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}  dtype={args.dtype}  B={args.batch}")
    results = {}
    for name, spatial, width, _ in STAGES:
        cg = width // GROUPS
        x = jnp.asarray(rng.randn(args.batch, spatial, spatial, width),
                        dt)
        w = jnp.asarray(rng.randn(3, 3, cg, width) * 0.05, dt)
        # dense block-diagonal kernel (3, 3, width, width)
        wd = np.zeros((3, 3, width, width), np.float32)
        for gi in range(GROUPS):
            wd[:, :, gi * cg:(gi + 1) * cg, gi * cg:(gi + 1) * cg] = \
                np.asarray(w[:, :, :, gi * cg:(gi + 1) * cg], np.float32)
        wd = jnp.asarray(wd, dt)

        ref = np.asarray(conv_grouped(x, w, GROUPS), np.float32)
        bd = np.asarray(conv_blockdiag(x, wd), np.float32)
        be = np.asarray(conv_batched_einsum(x, w), np.float32)
        tol = 2e-1 if dt == jnp.bfloat16 else 1e-4
        np.testing.assert_allclose(bd, ref, atol=tol, rtol=tol)
        np.testing.assert_allclose(be, ref, atol=tol, rtol=tol)

        g_chain = chained(lambda x, w: grouped_once(x, w, GROUPS), w)
        b_chain = chained(blockdiag_once, wd)
        e_chain = chained(batched_einsum_once, w)
        t_g = timeit(lambda f=g_chain, x=x: f(x), iters=args.iters)
        t_b = timeit(lambda f=b_chain, x=x: f(x), iters=args.iters)
        t_e = timeit(lambda f=e_chain, x=x: f(x), iters=args.iters)
        flops = 2 * args.batch * spatial * spatial * 9 * width * cg
        results[name] = (t_g, t_b, t_e)
        print(f"{name}: {spatial}^2 x{width} (Cg={cg})  "
              f"grouped={t_g:.3f}ms  blockdiag={t_b:.3f}ms  "
              f"einsum={t_e:.3f}ms   grouped-TFLOPs={flops / t_g / 1e9:.2f}")

    total = [sum(r[i] for r in results.values()) for i in range(3)]
    print(f"TOTAL per set of 4: grouped={total[0]:.3f}ms "
          f"blockdiag={total[1]:.3f}ms einsum={total[2]:.3f}ms")


if __name__ == "__main__":
    main()
