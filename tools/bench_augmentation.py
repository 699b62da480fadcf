#!/usr/bin/env python3
"""Per-op cost of the on-device augmentation pass (round-3 headline work).

bench.py measured the flagship step at 153.5 ms with reference-parity augs
on vs 123.7 off — ~30 ms for tensors whose bandwidth floor is <1 ms
(driver/target/segm at batch 8, 256² ≈ 6 MB f32 each).  This tool
attributes the cost per op with the repo-standard DCE-proof methodology
(chained-in-jit, max-|.|-full-reduce carry) so the hot ops can be attacked
individually and the fix verified in the full step afterwards.

    python tools/bench_augmentation.py [--batch 8] [--res 256] [--only blur]

NOTE: every row compiles its own fori_loop chain, ~60-90 s each over the
axon tunnel — a full run is ~15-20 min.  Use --only to bisect one op.

Reference counterpart: the imgaug CPU pipeline this pass replaces
(``/root/reference/dataloaders/common/augmentation.py:44-142``).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHAIN = 20


def main():
    import jax
    import jax.numpy as jnp

    from latentpose_tpu.data import augmentation as aug

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default="",
                    help="substring filter on row names (compile is "
                         "~60-90 s per row over the axon tunnel)")
    cli = ap.parse_args()

    b, r = cli.batch, cli.res
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (b, r, r, 3))
    segm = jax.random.uniform(key, (b, r, r, 1))

    def timeit(fn, *args):
        @jax.jit
        def run(*xs):
            def body(i, carry):
                out = fn(jax.random.fold_in(key, i),
                         xs[0] + carry.astype(xs[0].dtype), *xs[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jnp.max(jnp.abs(leaf.astype(jnp.float32))) * 1e-30
            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))
        run(*args).block_until_ready()
        start = time.perf_counter()
        out = None
        for _ in range(cli.iters):
            out = run(*args)
        out.block_until_ready()
        return (time.perf_counter() - start) / cli.iters / CHAIN * 1e3

    rows = [(op.__name__, partial(timeit, op, img))
            for op in aug.PIXELWISE_OPS]
    rows += [
        ("affine_scale(driver)", partial(timeit, lambda k, x:
         aug.augment_triplet(k, x, img, segm, use_scale=True)[0], img)),
        ("affine_shift(triplet)", partial(timeit, lambda k, x:
         aug.augment_triplet(k, x, img, segm, use_shift=True)[0], img)),
        ("pixelwise_all", partial(timeit, aug.pixelwise_augment, img)),
        ("full_triplet", partial(timeit, lambda k, x:
         aug.augment_triplet(k, x, img, segm, use_pixelwise=True,
                             use_scale=True, use_shift=True)[0], img)),
    ]
    for name, run in rows:
        if cli.only and cli.only not in name:
            continue
        print(json.dumps({"op": name, "ms": round(run(), 3)}))
        sys.stdout.flush()
    floor_ms = (b * r * r * 3 * 4 * 2) / 800e9 * 1e3
    print(json.dumps({"op": "bandwidth_floor_per_sweep",
                      "ms": round(floor_ms, 4)}))


if __name__ == "__main__":
    main()
