"""Decompose the meta-train step cost by component on the real TPU.

Times fwd and fwd+bwd of each FLOP-heavy piece (ResNeXt identity tower over
K=8 frames, MobileNetV2 pose, generator, discriminator x3 passes, VGG19 +
VGGFace towers) with chained-in-jit timing, so the meta-train optimization
target (bench.py train_step_ms_256, 127 ms @ r2) is attacked by measurement.

    python tools/bench_train_parts.py [--batch 8] [--iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time
import types
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

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=5)
    cli = parser.parse_args()
    b = cli.batch
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    def chain(fn, *example):
        """Time fn(*example) CHAIN times sequentially inside one jit."""
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

    # --- ResNeXt identity tower over K=8 frames ---
    from latentpose_tpu.nn.backbones import MobileNetV2, ResNeXt50
    rx = ResNeXt50(num_classes=512, dtype=dt)
    x64 = jax.random.normal(rng, (b * 8, 256, 256, 3), dt)
    rx_vars = rx.init(rng, x64[:1], train=False)

    results["resnext_k8_fwd"] = chain(
        lambda x: rx.apply(rx_vars, x, train=False), x64)

    def rx_loss(x):
        # squared loss + conv1-kernel grad leaf: grad(sum) wrt the final
        # bias is constant and XLA would eliminate the whole backward
        def loss(p):
            return jnp.sum(jnp.square(rx.apply(
                {**rx_vars, "params": p}, x,
                train=False).astype(jnp.float32)))
        return jax.grad(loss)(rx_vars["params"])["conv1"]["kernel"]
    results["resnext_k8_fwd_bwd"] = chain(rx_loss, x64)

    # --- MobileNetV2 pose ---
    mb = MobileNetV2(num_classes=256, dtype=dt)
    x8 = jax.random.normal(rng, (b, 256, 256, 3), dt)
    mb_vars = mb.init(rng, x8[:1], train=False)
    results["mobilenet_fwd"] = chain(
        lambda x: mb.apply(mb_vars, x, train=False), x8)

    # --- generator ---
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
    results["generator_fwd"] = chain(
        lambda e: gen.apply(gen_vars, {"embeds": e, "pose_embedding": pose},
                            update_stats=False)[0], emb)

    def gen_loss(e):
        def loss(p):
            rgb, _ = gen.apply({**gen_vars, "params": p},
                               {"embeds": e, "pose_embedding": pose},
                               update_stats=False)
            return jnp.sum(rgb.astype(jnp.float32))
        return jax.grad(loss)(gen_vars["params"])["constant"]
    results["generator_fwd_bwd"] = chain(gen_loss, emb)

    # --- discriminator (3 passes as in the GAN step) ---
    from latentpose_tpu.models.discriminators import no_landmarks as dis_mod
    dargs = types.SimpleNamespace(
        image_size=256, in_channels=3, num_channels=64,
        max_num_channels=512, embed_channels=512, dis_padding="zero",
        dis_num_blocks=7, num_labels=1000, lr_dis=2e-4, beta1=0.0,
        optimizer="Adam", finetune=False)
    dis = dis_mod.Wrapper.get_net(dargs)
    img = jax.random.normal(rng, (b, 256, 256, 3), dt)
    labels = jnp.zeros((b,), jnp.int32)
    dis_vars = dis.init(rng, img[:1], labels[:1])

    def dis3(x):
        outs = []
        for _ in range(3):
            score, _ = dis.apply(dis_vars, x, labels)
            outs.append(score)
        return sum(outs)
    results["discriminator_3x_fwd"] = chain(dis3, img)

    # --- VGG towers (perceptual + vggface) ---
    from latentpose_tpu.losses.common.perceptual_loss import PerceptualLoss
    perc = PerceptualLoss(1.0, None, net="caffe", compute_dtype="bfloat16",
                          allow_random=True)
    results["vgg19_pair"] = chain(lambda x: perc(x, x * 0.5), img)

    print(f"batch={b} bf16; ms per op (chained x{CHAIN}):")
    for k, v in results.items():
        print(f"  {k:24s} {v:8.2f} ms")
    print(f"  (bench.py full step @ r2: 127.3 ms)")


if __name__ == "__main__":
    main()
