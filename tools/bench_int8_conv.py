"""Is the v5e int8 MXU path worth a quantized drive mode?

Times bf16 vs int8(->int32) convolutions at the decoder's hot geometries
(XLA lowers integer convs onto the MXU; v5e peak is ~394 TOPS int8 vs
~197 TFLOP/s bf16).  Also times the quantize (scale+round+clip+cast) and
dequantize elementwise passes, since a real pipeline pays them between
convs unless they fuse.

    python tools/bench_int8_conv.py [--batch 128]
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
    rng = jax.random.PRNGKey(0)
    dn = ("NHWC", "HWIO", "NHWC")

    def chain(fn, x):
        @jax.jit
        def run(x0):
            def body(i, carry):
                out = fn(x0 + carry.astype(x0.dtype))
                # max-|.| full reduce: DCE/hoist-proof (see bench_up256_...)
                return jnp.max(jnp.abs(out.astype(jnp.float32))) * 1e-30
            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))
        return timeit(lambda: run(x), iters=cli.iters)

    # decoder-tail geometries: (name, H, C_in, C_out, kh)
    geoms = [
        ("up256 conv0-s2d 128²x128->256", 128, 128, 256, 3),
        ("up256 conv1 256²x64->64      ", 256, 64, 64, 3),
        ("up128 conv1 128²x128->128    ", 128, 128, 128, 3),
        ("up64 conv0-s2d 32²x512->1024 ", 32, 512, 1024, 3),
    ]

    for name, H, cin, cout, k in geoms:
        flops = 2 * b * H * H * k * k * cin * cout / 1e12
        xb = jax.random.normal(rng, (b, H, H, cin), jnp.bfloat16)
        kb = jax.random.normal(rng, (k, k, cin, cout), jnp.bfloat16) * 0.05
        xi = (jax.random.normal(rng, (b, H, H, cin)) * 20).astype(jnp.int8)
        ki = (jax.random.normal(rng, (k, k, cin, cout)) * 20
              ).astype(jnp.int8)

        def f_bf16(x, kb=kb):
            return lax.conv_general_dilated(
                x, kb, (1, 1), [(1, 1)] * 2 if k == 3 else [(0, 0)] * 2,
                dimension_numbers=dn)

        def f_int8(x, ki=ki):
            return lax.conv_general_dilated(
                x, ki, (1, 1), [(1, 1)] * 2 if k == 3 else [(0, 0)] * 2,
                dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        t_b = chain(f_bf16, xb)
        try:
            t_i = chain(f_int8, xi)
            ratio = t_b / t_i
            print(f"{name}: bf16 {t_b:7.3f} ms ({flops/t_b*1e3:6.0f} TF/s)"
                  f"  int8 {t_i:7.3f} ms ({flops/t_i*1e3:6.0f} TOP/s)"
                  f"  speedup {ratio:4.2f}x")
        except Exception as exc:
            print(f"{name}: bf16 {t_b:7.3f} ms; int8 FAILED: "
                  f"{str(exc)[:120]}")

    # quant/dequant elementwise costs at the tail scale
    xq = jax.random.normal(rng, (b, 256, 256, 64), jnp.bfloat16)

    def quantize(x):
        s = jnp.float32(0.05)
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                        -127, 127).astype(jnp.int8)

    xi8 = quantize(xq)

    def dequantize(x):
        return (x.astype(jnp.float32) * 0.05).astype(jnp.bfloat16)

    print(f"quantize   256²x64 bf16->int8: {chain(quantize, xq):7.3f} ms")
    print(f"dequantize 256²x64 int8->bf16: {chain(dequantize, xi8):7.3f} ms")


if __name__ == "__main__":
    main()
