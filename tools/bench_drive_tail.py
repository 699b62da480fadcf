"""Per-stage timing of the flagship generator's decoder on the real TPU.

STATUS r1: drive is ~90% generator at ~25% MXU utilization, tail layers
"lane-starved/bandwidth-bound" — but unprofiled (jax.profiler cannot attach
through the axon tunnel).  This measures each decoder ResBlock config, the
head conv, and the whole generator forward with chained-in-jit timing
(dispatch latency through the tunnel is ~1 ms and must be amortized), so
the optimization target is a measurement, not a guess (VERDICT r1 item 4).

    python tools/bench_drive_tail.py [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHAIN = 20


def timeit(fn, iters=10):
    fn().block_until_ready()
    start = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    return (time.perf_counter() - start) / iters / CHAIN * 1e3  # ms/op


def main():
    import jax
    import jax.numpy as jnp

    from latentpose_tpu.nn.blocks import ResBlock
    from latentpose_tpu.ops.spectral_norm import SNConv

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()
    b = args.batch
    dt = jnp.bfloat16

    # (name, res_in, in_ch, out_ch, upsample) — flagship 256² schedule
    stages = [
        ("const0", 4, 512, 512, False),
        ("const1", 4, 512, 512, False),
        ("up8", 4, 512, 512, True),
        ("up16", 8, 512, 512, True),
        ("up32", 16, 512, 512, True),
        ("up64", 32, 512, 256, True),
        ("up128", 64, 256, 128, True),
        ("up256", 128, 128, 64, True),
    ]

    rng = jax.random.PRNGKey(0)
    total = 0.0
    print(f"devices: {jax.devices()}  batch={b} bf16")
    for name, res, in_ch, out_ch, up in stages:
        block = ResBlock(in_ch, out_ch, norm_layer="adain", upsample=up)
        x = jax.random.normal(rng, (b, res, res, in_ch), dt)
        ada0 = (jnp.ones((b, in_ch), dt), jnp.zeros((b, in_ch), dt))
        ada1 = (jnp.ones((b, out_ch), dt), jnp.zeros((b, out_ch), dt))
        variables = block.init(rng, x, ada0=ada0, ada1=ada1)

        def once(inp, block=block, variables=variables, ada0=ada0,
                 ada1=ada1):
            out, _ = block.apply(variables, inp, ada0=ada0, ada1=ada1,
                                 update_stats=False, mutable=["spectral"])
            return out

        @jax.jit
        def chained(x0, once=once):
            def body(i, carry):
                out = once(x0 + carry.astype(x0.dtype))
                # max-|.| full reduce: not linearly separable, so XLA can
                # neither slice through pure convs (DCE) nor hoist the body
                return jnp.max(jnp.abs(out.astype(jnp.float32))) * 1e-30
            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))

        ms = timeit(lambda f=chained, x=x: f(x), iters=args.iters)
        res_out = res * 2 if up else res
        conv_flops = 2 * b * res_out ** 2 * 9 * in_ch * out_ch \
            + 2 * b * res_out ** 2 * 9 * out_ch * out_ch
        total += ms
        print(f"{name:7s} {res}->{res_out} {in_ch}->{out_ch}: {ms:7.3f} ms"
              f"   ~{conv_flops / ms / 1e9:7.1f} TFLOP/s")

    # head: AdaIN+relu+SNConv(64->4)+tanh at 256²
    head = SNConv(4, (3, 3), padding=1, use_bias=True)
    x = jax.random.normal(rng, (b, 256, 256, 64), dt)
    variables = head.init(rng, x)

    @jax.jit
    def head_chained(x0):
        def body(i, carry):
            out, _ = head.apply(variables, x0 + carry.astype(x0.dtype),
                                mutable=["spectral"])
            return jnp.max(jnp.abs(out.astype(jnp.float32))) * 1e-30
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))

    ms = timeit(lambda: head_chained(x), iters=args.iters)
    total += ms
    print(f"head    256 64->4:  {ms:7.3f} ms")
    print(f"SUM of stages: {total:.3f} ms "
          f"({b / total * 1e3:.0f} fps equivalent)")

    # whole generator forward for cross-checking the decomposition
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)
    gargs = types.SimpleNamespace(
        image_size=256, out_channels=3, num_channels=64,
        max_num_channels=512, embed_channels=512, pose_embedding_size=256,
        gen_padding="zero", gen_constant_input_size=4,
        gen_num_residual_blocks=2, norm_layer="in")
    gen = gen_mod.Wrapper.get_net(gargs)
    gen_vars = gen.init(rng, {"embeds": jnp.zeros((1, 512)),
                              "pose_embedding": jnp.zeros((1, 256))})
    emb = jax.random.normal(rng, (b, 512), dt)
    pose = jax.random.normal(rng, (b, 256), dt)

    @jax.jit
    def gen_chained(emb, pose):
        def body(i, carry):
            rgbs, _ = gen.apply(gen_vars,
                                {"embeds": emb + carry.astype(emb.dtype),
                                 "pose_embedding": pose},
                                update_stats=False)
            return jnp.max(jnp.abs(rgbs.astype(jnp.float32))) * 1e-30
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))

    ms = timeit(lambda: gen_chained(emb, pose), iters=args.iters)
    print(f"FULL generator fwd: {ms:.3f} ms ({b / ms * 1e3:.0f} fps)")


if __name__ == "__main__":
    main()
