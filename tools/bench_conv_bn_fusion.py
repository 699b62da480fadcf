"""Measured adopt/reject decision for Pallas conv1x1+BN fusion (VERDICT r2
Next #5: attack the ResNeXt tower's ~44 ms with a measurement).

Compares, at the real tower geometries (frames=64 = batch 8 x K 8), a chain
of L [BN(train) -> ReLU -> conv1x1 -> next-BN-stats] links:

  xla:    flax nn.BatchNorm(train) + relu + lax conv (the production path)
  pallas: ops/pallas/conv_bn_fused.bn_relu_conv1x1_stats — one kernel per
          link, 2-HBM-sweep floor (read x + write y; stats free)

Forward-only: if the fwd win at the dominant geometries is small, the far
more complex custom-VJP backward cannot pay for itself and the item is
rejected with these numbers (the grouped 3x3s and the bwd pass stay XLA
either way).

    python tools/bench_conv_bn_fusion.py [--frames 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHAIN = 10


def timeit(fn, iters=5):
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
    import flax.linen as nn

    from latentpose_tpu.ops.pallas.conv_bn_fused import (
        bn_relu_conv1x1_stats, fold_bn)

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--links", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    cli = ap.parse_args()
    n, L = cli.frames, cli.links
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    def chain(fn, *example):
        @jax.jit
        def run(*xs):
            def body(i, carry):
                out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jnp.max(jnp.abs(leaf.astype(jnp.float32))) * 1e-30
            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))
        return timeit(lambda: run(*example), iters=cli.iters)

    # real tower 1x1 geometries: (res, cin, cout) — bottleneck conv1/conv3
    geoms = [("layer1 64² 256->128", 64, 256, 128),
             ("layer1 64² 128->256", 64, 128, 256),
             ("layer2 32² 512->256", 32, 512, 256),
             ("layer3 16² 1024->512", 16, 1024, 512)]

    results = {}
    for name, res, cin, cout in geoms:
        x = jax.random.normal(rng, (n, res, res, cin), dt)
        # L alternating links cin->cout->cin->...
        ws, bns = [], []
        k = rng
        for i in range(L):
            ci, co = (cin, cout) if i % 2 == 0 else (cout, cin)
            k, sub = jax.random.split(k)
            ws.append(jax.random.normal(sub, (ci, co), dt)
                      * (1.0 / ci) ** 0.5)
            bns.append((jnp.zeros((ci,)), jnp.ones((ci,)),
                        jnp.ones((ci,)), jnp.zeros((ci,))))  # m, v, g, b

        class XlaChain(nn.Module):
            @nn.compact
            def __call__(self, h):
                for i in range(L):
                    h = nn.BatchNorm(use_running_average=False,
                                     momentum=0.9, epsilon=1e-5, dtype=dt,
                                     name=f"bn{i}")(h)
                    h = nn.relu(h)
                    ci, co = (cin, cout) if i % 2 == 0 else (cout, cin)
                    h = nn.Conv(co, (1, 1), use_bias=False, dtype=dt,
                                name=f"conv{i}")(h)
                return h

        xc = XlaChain()
        xv = xc.init(jax.random.PRNGKey(1), x[:1])

        def xla_fn(h):
            out, _ = xc.apply(xv, h, mutable=["batch_stats"])
            return out
        xla_ms = chain(xla_fn, x)

        m_pix = n * res * res

        def pallas_fn(h):
            stats = None
            for i in range(L):
                if stats is None:
                    scale = jnp.ones((h.shape[-1],), jnp.float32)
                    offset = jnp.zeros((h.shape[-1],), jnp.float32)
                else:
                    mean = stats[0] / m_pix
                    var = stats[1] / m_pix - mean * mean
                    scale, offset = fold_bn(mean, var,
                                            jnp.ones_like(mean),
                                            jnp.zeros_like(mean))
                h, stats = bn_relu_conv1x1_stats(h, scale, offset, ws[i])
            return h
        pallas_ms = chain(pallas_fn, x)

        results[name] = (xla_ms, pallas_ms)
        print(json.dumps({"geom": name, "links": L,
                          "xla_ms": round(xla_ms, 3),
                          "pallas_ms": round(pallas_ms, 3),
                          "speedup": round(xla_ms / pallas_ms, 2)}))
        sys.stdout.flush()

    total_x = sum(v[0] for v in results.values())
    total_p = sum(v[1] for v in results.values())
    print(json.dumps({"geom": "TOTAL", "xla_ms": round(total_x, 3),
                      "pallas_ms": round(total_p, 3),
                      "speedup": round(total_x / total_p, 2)}))


if __name__ == "__main__":
    main()
