"""Attribute + attack the VGG criterion towers' share of the meta-train step.

The r2/r3 step decomposition puts the two frozen perceptual towers (VGG19
full-frame + VGGFace-16 on face crops, reference
``criterions/common/perceptual_loss.py:32-88``) at ~21 ms of the 121 ms
step.  Both are architecture-constrained (parity requires the exact caffe
stacks), so only layout/scheduling levers exist.  This tool measures, with
the repo-standard DCE-proof methodology (chained-in-jit, max-|.|-reduce
carry — see tools/bench_train_parts.py):

1. what the step actually pays per criterion: fwd(fake) + bwd-to-input(fake)
   + fwd(real, stop-grad), at flagship shapes (B=8, 256^2, bf16 tower);
2. a per-stage prefix attribution of the VGG19 fwd+bwd (truncation at each
   pool boundary) to locate the hot layers;
3. candidate variants:
   - ``pair_batched``: one 2B-batch tower apply for fake+real instead of
     two B-batch applies (fewer dispatches, but the backward then sweeps
     the real half too — measured, not assumed);
   - f32 tower as the ratio check on the bf16 path.

    python tools/bench_vgg_tower.py [--batch 8] [--iters 5] [--only substr]

NOTE: each row compiles its own fori_loop chain over the axon tunnel
(~60-90 s); a full run is ~10-15 min.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHAIN = 10


def main():
    import jax
    import jax.numpy as jnp

    from latentpose_tpu.losses.common.perceptual_loss import PerceptualLoss
    from latentpose_tpu.nn.vgg import VGG19_CFG, VGGFeatures

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", default="")
    cli = ap.parse_args()
    b = cli.batch
    rng = jax.random.PRNGKey(0)
    fake = jax.random.normal(rng, (b, 256, 256, 3), jnp.float32)
    real = fake * 0.5 + 0.1

    def timeit(fn):
        fn().block_until_ready()
        start = time.perf_counter()
        out = None
        for _ in range(cli.iters):
            out = fn()
        out.block_until_ready()
        return (time.perf_counter() - start) / cli.iters / CHAIN * 1e3

    def chain(fn, *example):
        @jax.jit
        def run(*xs):
            def body(i, carry):
                out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jnp.max(jnp.abs(leaf.astype(jnp.float32))) * 1e-30
            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))
        return timeit(lambda: run(*example))

    perc = PerceptualLoss(1.0, None, net="caffe", compute_dtype="bfloat16",
                          allow_random=True)
    face = PerceptualLoss(1.0, None, net="face", compute_dtype="bfloat16",
                          allow_random=True)
    perc32 = PerceptualLoss(1.0, None, net="caffe", compute_dtype="float32",
                            allow_random=True)

    rows = []

    # --- what the train step pays (loss + grad wrt fake) -------------------
    rows.append(("vgg19_pair_fwd", partial(chain, perc, fake, real)))
    rows.append(("vgg19_pair_fwd_bwd",
                 partial(chain, lambda x, y: jax.grad(perc)(x, y),
                         fake, real)))
    rows.append(("vggface_pair_fwd_bwd",
                 partial(chain, lambda x, y: jax.grad(face)(x, y),
                         fake, real)))
    rows.append(("vgg19_pair_fwd_bwd_f32",
                 partial(chain, lambda x, y: jax.grad(perc32)(x, y),
                         fake, real)))

    # --- variant: one 2B-batch apply for fake+real -------------------------
    def batched_pair(x, y):
        xn = perc._normalize((x + 1.0) / 2.0)
        yn = perc._normalize((jax.lax.stop_gradient(y) + 1.0) / 2.0)
        xy = jnp.concatenate([xn, yn], 0).astype(perc.compute_dtype)
        feats = perc.module.apply(perc.variables, xy)
        loss = 0.0
        for f in feats:
            fx, fy = jnp.split(f, 2, axis=0)
            loss = loss + jnp.mean(
                jnp.abs(fx - jax.lax.stop_gradient(fy))
                .astype(jnp.float32))
        return loss * perc.weight

    rows.append(("vgg19_pair_batched_fwd_bwd",
                 partial(chain, lambda x, y: jax.grad(batched_pair)(x, y),
                         fake, real)))

    # --- per-stage prefix attribution (fwd+bwd through the prefix) ---------
    # torch-layer indices of each pool boundary in the 30-layer VGG19 stack
    for name, layers in (("stage1(pool1)", 5), ("stage2(pool2)", 10),
                         ("stage3(pool3)", 19), ("stage4(pool4)", 28),
                         ("full(relu5_1)", 30)):
        tower = VGGFeatures(cfg=VGG19_CFG, num_layers=layers,
                            dtype=jnp.bfloat16)
        tvars = perc.variables  # full-tower params; flax ignores extras

        def prefix_loss(x, tower=tower, tvars=tvars):
            feats = tower.apply(
                tvars, perc._normalize((x + 1.0) / 2.0)
                .astype(jnp.bfloat16))
            return sum(jnp.mean(jnp.abs(f).astype(jnp.float32))
                       for f in feats)

        rows.append((f"vgg19_prefix_{name}_fwd_bwd",
                     partial(chain,
                             lambda x, fn=prefix_loss: jax.grad(fn)(x),
                             fake)))

    print(f"batch={b}; ms per row (chained x{CHAIN}):")
    for name, run in rows:
        if cli.only and cli.only not in name:
            continue
        print(json.dumps({"row": name, "ms": round(run(), 3)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
