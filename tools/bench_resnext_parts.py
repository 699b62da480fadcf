"""Per-stage timing of the ResNeXt-50 identity tower (K=8 frames, train step
hot spot: ~40 ms of the 127 ms meta-train step, tools/bench_train_parts.py).

Times stem (conv1 7x7/2 + bn + maxpool), each of the 4 stages, and the
embedder-tower fwd / fwd+bwd in train mode (BN batch stats, as the real step
runs), with chained-in-jit timing.

    python tools/bench_resnext_parts.py [--frames 64]
"""

from __future__ import annotations

import argparse
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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from latentpose_tpu.nn import backbones

    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=64,
                        help="batch x K (meta-train: 8 x 8)")
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--train", action="store_true", default=True)
    cli = parser.parse_args()
    n = cli.frames
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    def chain(fn, *example):
        @jax.jit
        def run(*xs):
            def body(i, carry):
                out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                # max-|.| full reduce: not linearly separable, so XLA can
                # neither slice through convs (DCE) nor hoist the body
                return jnp.max(jnp.abs(leaf.astype(jnp.float32))) * 1e-30
            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))
        return timeit(lambda: run(*example), iters=cli.iters)

    results = {}

    # ---- stem: conv1 7x7/2 + bn + relu + maxpool ------------------------
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, dtype=dt, name="conv1")(x)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=dt, name="bn1")(h)
            h = nn.relu(h)
            return nn.max_pool(h, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

    stem = Stem()
    x0 = jax.random.normal(rng, (n, 256, 256, 3), dt)
    sv = stem.init(rng, x0[:1], train=False)

    def stem_train(x):
        out, _ = stem.apply(sv, x, train=True, mutable=["batch_stats"])
        return out
    results["stem (conv7x7+bn+pool)"] = chain(stem_train, x0)

    # ---- stages ---------------------------------------------------------
    # (planes, blocks, stride, in_res, in_ch)
    stages = [(64, 3, 1, 64, 64), (128, 4, 2, 64, 256),
              (256, 6, 2, 32, 512), (512, 3, 2, 16, 1024)]

    class Stage(nn.Module):
        planes: int
        blocks: int
        stride: int
        in_ch: int

        @nn.compact
        def __call__(self, x, train=True):
            in_features = self.in_ch
            for i in range(self.blocks):
                s = self.stride if i == 0 else 1
                needs_ds = (s != 1) or (in_features != self.planes * 4)
                x = backbones.Bottleneck(self.planes, s,
                                         has_downsample=needs_ds, dtype=dt,
                                         name=f"b{i}")(x, train)
                in_features = self.planes * 4
            return x

    for si, (planes, blocks, stride, res, in_ch) in enumerate(stages):
        st = Stage(planes, blocks, stride, in_ch)
        xs = jax.random.normal(rng, (n, res, res, in_ch), dt)
        v = st.init(rng, xs[:1], train=False)

        def stage_train(x, st=st, v=v):
            out, _ = st.apply(v, x, train=True, mutable=["batch_stats"])
            return out
        results[f"layer{si+1} ({blocks}x bottleneck {planes})"] = \
            chain(stage_train, xs)

    # ---- full tower fwd / fwd+bwd (train mode) --------------------------
    rx = backbones.ResNeXt50(num_classes=512, dtype=dt)
    rx_vars = rx.init(rng, x0[:1], train=False)

    def fwd(x):
        out, _ = rx.apply(rx_vars, x, train=True, mutable=["batch_stats"])
        return out
    results["FULL tower fwd (train)"] = chain(fwd, x0)

    def fwd_bwd(x):
        # nonlinear loss + a grad leaf that depends on the whole graph —
        # grad(sum(out)) wrt the final bias is constant ones and lets XLA
        # eliminate the entire backward pass
        def loss(p):
            out, _ = rx.apply({**rx_vars, "params": p}, x, train=True,
                              mutable=["batch_stats"])
            return jnp.sum(jnp.square(out.astype(jnp.float32)))
        return jax.grad(loss)(rx_vars["params"])["conv1"]["kernel"]
    results["FULL tower fwd+bwd"] = chain(fwd_bwd, x0)

    print(f"frames={n} bf16 train-mode BN; ms per op (chained x{CHAIN}):")
    for k, v in results.items():
        print(f"  {k:32s} {v:8.2f} ms")


if __name__ == "__main__":
    main()
