"""Cumulative in-context timing of one decoder up-block's pieces.

bench_drive_tail (honest reducer) shows up256 at ~32 ms while its pieces
individually sum to ~17 ms; this tool times the block as a cumulative
pipeline — ada0 | +conv0 | +ada1 | +conv1 | +skip+add — so each marginal
cost is measured in context (same methodology, overheads cancel in the
differences).

    python tools/bench_block_pieces.py [--stage up256|up128]
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

    from latentpose_tpu.ops import norms as norm_ops
    from latentpose_tpu.ops.image import upsample2x_conv3x3, \
        upsample_nearest_2x

    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", default="up256",
                        choices=["up256", "up128", "up64"])
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    cli = parser.parse_args()
    b = cli.batch
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    geo = {"up256": (128, 128, 64), "up128": (64, 256, 128),
           "up64": (32, 512, 256)}
    H, CIN, COUT = geo[cli.stage]

    x = jax.random.normal(rng, (b, H, H, CIN), dt)
    k0 = jax.random.normal(rng, (3, 3, CIN, COUT), dt) * 0.05
    k1 = jax.random.normal(rng, (3, 3, COUT, COUT), dt) * 0.05
    ks = jax.random.normal(rng, (1, 1, CIN, COUT), dt) * 0.05
    w0 = jnp.full((b, CIN), 1.1, dt)
    b0 = jnp.full((b, CIN), 0.1, dt)
    w1 = jnp.full((b, COUT), 1.1, dt)
    b1 = jnp.full((b, COUT), 0.1, dt)
    dn = ("NHWC", "HWIO", "NHWC")

    def chain(fn):
        @jax.jit
        def run(x0):
            def body(i, carry):
                out = fn(x0 + carry.astype(x0.dtype))
                return jnp.max(jnp.abs(out.astype(jnp.float32))) * 1e-30
            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))
        return timeit(lambda: run(x), iters=cli.iters)

    def p_ada0(h):
        return jax.nn.relu(norm_ops.adain(h, w0, b0))

    def p_conv0(h):
        return upsample2x_conv3x3(p_ada0(h), k0)

    def p_ada1(h):
        return jax.nn.relu(norm_ops.adain(p_conv0(h), w1, b1))

    def p_conv1(h):
        return lax.conv_general_dilated(p_ada1(h), k1, (1, 1),
                                        [(1, 1), (1, 1)],
                                        dimension_numbers=dn)

    def p_full(h):
        s = lax.conv_general_dilated(h, ks, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn)
        return p_conv1(h) + upsample_nearest_2x(s)

    steps = [("ada0+relu", p_ada0), ("+ up-conv0", p_conv0),
             ("+ ada1+relu", p_ada1), ("+ conv1", p_conv1),
             ("+ skip + add (FULL)", p_full)]
    print(f"{cli.stage}: {H}²x{CIN} -> {2*H}²x{COUT}, batch={b} bf16")
    prev = 0.0
    for name, fn in steps:
        ms = chain(fn)
        print(f"  {name:22s} {ms:7.3f} ms   (marginal {ms - prev:+7.3f})")
        prev = ms


if __name__ == "__main__":
    main()
