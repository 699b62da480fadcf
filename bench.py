#!/usr/bin/env python3
"""Headline benchmark: driven 256² frames/sec on the flagship model.

Measures the inference hot path (MobileNetV2 pose encoder + AdaIN generator,
bfloat16, batched) — the reference runs this batch-1 per frame in a Python
loop (``drive.py:57,84-98``, no published number); the driver-provided
north-star is >=2000 frames/s on v5e-8 (BASELINE.md), i.e. 250/s/chip.

Prints ONE JSON line:
  {"metric": "drive_fps_256", "value": N, "unit": "frames/s",
   "vs_baseline": N / <per-chip share of the 2000 fps target>}
"""

from __future__ import annotations

import json
import sys
import time
import types

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from latentpose_tpu.models.embedders import (
        unsupervised_pose_separate_embResNeXt_segmentation as emb_mod)
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)

    n_chips = len(jax.devices())
    image_size = 256
    batch = 128  # throughput saturates ~here on v5e (sweep: 64->923,
    #              128->1190, 256->1197 fps/chip)

    args = types.SimpleNamespace(
        image_size=image_size, in_channels=3, out_channels=3,
        num_channels=64, max_num_channels=512, embed_channels=512,
        pose_embedding_size=256, gen_padding="zero",
        gen_constant_input_size=4, gen_num_residual_blocks=2,
        norm_layer="in", average_function="sum",
        compute_dtype="bfloat16")

    embedder = emb_mod.Wrapper.get_net(args)
    generator = gen_mod.Wrapper.get_net(args)

    rng = jax.random.PRNGKey(0)
    emb_vars = embedder.init(
        rng, jnp.zeros((1, 1, image_size, image_size, 3)),
        jnp.zeros((1, 1, image_size, image_size, 3)))
    gen_vars = generator.init(
        rng, {"embeds": jnp.zeros((1, 512)),
              "pose_embedding": jnp.zeros((1, 256))})
    identity = jax.random.normal(rng, (1, 512))

    cd = jnp.bfloat16

    @jax.jit
    def drive_step(frames):
        pose = embedder.apply(emb_vars, frames.astype(cd)[:, None],
                              train=False, method="get_pose_embedding")
        idt = jnp.broadcast_to(identity, (frames.shape[0], 512))
        rgbs, _ = generator.apply(
            gen_vars, {"embeds": idt.astype(cd),
                       "pose_embedding": pose.astype(cd)},
            update_stats=False)
        return rgbs  # bf16 on device; video writer converts on host

    frames = jax.device_put(
        np.random.rand(batch, image_size, image_size, 3).astype(np.float32))

    # Warmup / compile
    drive_step(frames).block_until_ready()

    n_iters = 20
    start = time.perf_counter()
    in_flight = []
    for _ in range(n_iters):
        in_flight.append(drive_step(frames))
        if len(in_flight) > 2:  # keep the device queue fed
            in_flight.pop(0).block_until_ready()
    for out in in_flight:
        out.block_until_ready()
    elapsed = time.perf_counter() - start

    fps = batch * n_iters / elapsed
    # Target: 2000 fps on 8 chips -> scale to this run's chip count.
    target = 2000.0 * n_chips / 8.0
    print(json.dumps({
        "metric": "drive_fps_256",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / target, 3),
    }))
    return fps


if __name__ == "__main__":
    sys.exit(0 if main() > 0 else 1)
