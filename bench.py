#!/usr/bin/env python3
"""Headline benchmarks on the flagship model (one real chip).

1. meta-train step (K=8 identity frames, batch 8, all 6 losses, 256², bf16)
   — the reference trains this for 1.0-2.7M iterations on 2 GPUs (no
   published time); ``vs_baseline`` is speedup vs our round-1 measurement
   (149 ms/step, STATUS r1) so regressions are visible round-over-round.
2. driven 256² frames/sec (MobileNetV2 pose encoder + AdaIN generator,
   bfloat16, batched) — the reference runs this batch-1 per frame in a
   Python loop (``drive.py:57,84-98``); the driver-provided north-star is
   >=2000 frames/s on v5e-8 (BASELINE.md), i.e. 250/s/chip.

Prints one JSON line per metric; the LAST line is the headline:
  {"metric": "drive_fps_256", "value": N, "unit": "frames/s",
   "vs_baseline": N / <per-chip share of the 2000 fps target>}
"""

from __future__ import annotations

import json
import sys
import time
import types

import numpy as np


R1_TRAIN_STEP_MS = 149.0  # round-1 measured baseline (STATUS r1)

# Peak MXU throughput by device kind (public spec sheets), used for MFU.
# (device_kind substring, bf16 peak FLOP/s, int8 peak OP/s)
TPU_PEAK_FLOPS = (
    ("v6", 918e12, 1836e12),   # Trillium / v6e
    ("v5p", 459e12, 918e12),
    ("v5", 197e12, 394e12),    # v5e ("TPU v5 lite")
    ("v4", 275e12, 275e12),    # no int8 MXU speedup on v4
    ("v3", 123e12, 123e12),
)


def device_peak_flops(int8=False):
    """Peak FLOP/s of device 0, or None when unknown / not a TPU."""
    import jax
    if jax.default_backend() == "cpu":
        return None
    kind = jax.devices()[0].device_kind.lower()
    for sub, bf16_peak, int8_peak in TPU_PEAK_FLOPS:
        if sub in kind:
            return int8_peak if int8 else bf16_peak
    return None


def compiled_flops(compiled):
    """XLA compiler-counted FLOPs of an AOT-compiled program (model FLOPs
    for MFU — the same numerator the scaling-book convention uses)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def emit_mfu(metric, flops, seconds, int8=False):
    """Print an MFU metric line; vs_baseline is MFU/0.4 (0.4 = the
    conventional 'well-optimized training' bar; the reference has no MFU
    counterpart — this is the TPU-first yardstick, SURVEY §6)."""
    peak = device_peak_flops(int8=int8)
    if not (flops and peak and seconds > 0):
        return None
    mfu = flops / seconds / peak
    print(json.dumps({
        "metric": metric,
        "value": round(mfu, 4),
        "unit": "fraction of %.0f TFLOP/s peak" % (peak / 1e12),
        "vs_baseline": round(mfu / 0.4, 3),
    }))
    sys.stdout.flush()
    return mfu


def bench_train_step(with_augs=True):
    """Full meta-train step: both optimizers, EMA, spectral state, 6 losses,
    K=8 identity frames at 256², global batch 8, bf16 compute.  With
    ``with_augs`` (the default, matching reference configs/default.yaml:32-34)
    the on-device augmentation pass is included in the step."""
    import jax
    import types

    import numpy as np

    from latentpose_tpu.losses import (adversarial, dice, dis_embed,
                                       featmat, idt_embed, perceptual)
    from latentpose_tpu.models.discriminators import no_landmarks as dis_mod
    from latentpose_tpu.models.embedders import (
        unsupervised_pose_separate_embResNeXt_segmentation as emb_mod)
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)
    from latentpose_tpu.runners import build, holycow

    batch, k_frames = 8, 8
    args = types.SimpleNamespace(
        image_size=256, in_channels=3, out_channels=3, num_channels=64,
        max_num_channels=512, embed_channels=512, pose_embedding_size=256,
        gen_padding="zero", gen_constant_input_size=4,
        gen_num_residual_blocks=2, norm_layer="in", dis_padding="zero",
        dis_num_blocks=7, num_labels=1000, optimizer="Adam", lr_gen=5e-5,
        lr_dis=2e-4, beta1=0.0, average_function="sum", finetune=False,
        iteration=0, set_eval_mode_in_train=False, batch_size=batch,
        random_seed=0, gan_type="gan", fm_weight=10.0, dice_weight=1.0,
        perc_weight=3e-2, idt_embed_weight=0.6e-2, dis_embed_weight=1e-2,
        vgg_weights_dir="", allow_random_vgg=True,
        compute_dtype="bfloat16",
        # reference-parity default: flagship meta-training augments on
        # (configs/default.yaml — use_pixelwise_augs/use_affine_scale/
        # use_affine_shift all True); augs run inside the jitted step
        use_pixelwise_augs=with_augs, use_affine_scale=with_augs,
        use_affine_shift=with_augs)

    models = {"embedder": emb_mod.Wrapper.get_net(args),
              "generator": gen_mod.Wrapper.get_net(args),
              "discriminator": dis_mod.Wrapper.get_net(args)}
    criteria = [idt_embed.Wrapper.get_net(args),
                perceptual.Wrapper.get_net(args),
                adversarial.Criterion(args.gan_type),
                featmat.Criterion(args.fm_weight),
                dis_embed.Criterion(args.dis_embed_weight),
                dice.Criterion(args.dice_weight)]
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": dis_mod})
    rng = jax.random.PRNGKey(0)
    state = build.init_train_state(args, models, opt_g, opt_d, rng)
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d,
                                      donate=True)

    rnd = np.random.RandomState(0)
    batch_data = {
        "enc_rgbs": rnd.rand(batch, k_frames, 256, 256,
                             3).astype(np.float32),
        "pose_input_rgbs": rnd.rand(batch, 1, 256, 256,
                                    3).astype(np.float32),
        "target_rgbs": rnd.rand(batch, 1, 256, 256, 3).astype(np.float32),
        "real_segm": rnd.rand(batch, 1, 256, 256, 1).astype(np.float32),
        "label": (np.arange(batch) % args.num_labels).astype(np.int32),
    }
    batch_data = jax.device_put(batch_data)

    # AOT: one lowering serves execution, MFU cost analysis, and the
    # end-to-end loop below without a second trace/compile.
    compiled = step_fn.lower(state, batch_data, rng).compile()
    state, _ = compiled(state, batch_data, rng)  # warmup
    jax.block_until_ready(state.params)

    n_iters = 10
    start = time.perf_counter()
    for i in range(n_iters):
        state, _ = compiled(state, batch_data, jax.random.fold_in(rng, i))
    jax.block_until_ready(state.params)
    ms = (time.perf_counter() - start) / n_iters * 1e3
    print(json.dumps({
        "metric": "train_step_ms_256" + ("" if with_augs else "_noaugs"),
        "value": round(ms, 1),
        "unit": "ms/step",
        "vs_baseline": round(R1_TRAIN_STEP_MS / ms, 3),
    }))
    sys.stdout.flush()
    if with_augs:
        emit_mfu("train_step_mfu", compiled_flops(compiled), ms / 1e3)
        bench_train_e2e(step_fn, compiled, state, rng, batch, ms)
    return ms


def bench_train_e2e(step_fn, compiled, state, rng, batch, compiled_ms,
                    n_steps=50):
    """Wall-clock steps/s INCLUDING the host input pipeline: SyntheticDataset
    -> BatchLoader (threaded prefetch) -> jitted step, >=50 steps (VERDICT r3
    item 4 — turns the 'N host cores needed' extrapolation into an
    end-to-end measurement; hot loop parity: reference holycow.py:224-252).

    The synthetic source is cache-warm after epoch 1, so this measures the
    loop machinery (collate, queue, H2D, dispatch overlap), not JPEG decode —
    decode throughput has its own bench (tools/bench_input_pipeline.py).
    ``vs_baseline`` is compiled-step-only ms / end-to-end ms, i.e. input
    overlap efficiency (1.0 = input fully hidden behind the device step).
    """
    import os

    import jax

    from latentpose_tpu.data.pipeline import BatchLoader
    from latentpose_tpu.data.synthetic import SyntheticDataset

    cores = os.cpu_count() or 1

    from latentpose_tpu.runners.loop import device_prefetch

    def make_pairs(wire_dtype):
        # 8 labels x 16 frames @256² ≈ 128 MB of rendered frames — fits
        # the synthetic renderer's slab cache, so epochs >= 2 are
        # cache-warm (16 labels x 32 frames would thrash the slab and
        # measure rendering, not the loop).  wire_dtype='uint8' emits the
        # wire format straight from the render cache — no per-batch
        # f32->u8 pass (the production --transfer_dtype uint8 data path).
        from latentpose_tpu.data.synthetic import (render_face,
                                                   render_face_u8)
        for lb in range(8):     # warm the render cache fully up front so
            for f in range(16):  # the timed loop measures the machinery,
                render_face(lb, f, 256)          # not first-touch renders
                if wire_dtype == "uint8":
                    render_face_u8(lb, f, 256)
        dataset = SyntheticDataset(256, num_labels=8, num_enc_frames=8,
                                   frames_per_video=16,
                                   wire_dtype=wire_dtype)
        loader = BatchLoader(dataset, batch, shuffle=True, seed=0,
                             num_workers=min(cores, 8),
                             prefetch_size=4 * batch,
                             shard_by_process=False)

        def pairs():
            while True:
                for data_dict, target_dict in loader:
                    yield {**data_dict, **target_dict}, {}
        return pairs

    def run_variant(metric, transfer_dtype, unit, depth=3):
        # the PRODUCTION prefetcher (runners/loop.device_prefetch):
        # threaded producer staging quantize + device_put ahead of the
        # consumer's dispatch, async H2D overlapping the device step
        nonlocal state  # the step donates its input state buffers
        feed_args = types.SimpleNamespace(transfer_dtype=transfer_dtype)
        it = device_prefetch(make_pairs(transfer_dtype)(), feed_args,
                             mesh=None, depth=depth)
        first = next(it)
        compiled_v = step_fn.lower(state, first, rng).compile()
        state, _ = compiled_v(state, first, rng)  # warm the render cache
        jax.block_until_ready(state.params)
        start = time.perf_counter()
        for i in range(n_steps):
            state, _ = compiled_v(state, next(it),
                                  jax.random.fold_in(rng, i))
        jax.block_until_ready(state.params)
        ms = (time.perf_counter() - start) / n_steps * 1e3
        print(json.dumps({
            "metric": metric,
            "value": round(ms, 1),
            "unit": unit,
            "vs_baseline": round(compiled_ms / ms, 3),
        }))
        sys.stdout.flush()
        return ms

    e2e_ms = run_variant(
        "train_step_ms_256_e2e", "float32",
        f"ms/step incl. input ({cores} host cores, synthetic)")
    try:
        # --transfer_dtype uint8 wire format: 4x fewer H2D bytes (the
        # in-step dequantize is runners/holycow.dequantize_batch) — the
        # lever when the host->device link bounds end-to-end throughput
        run_variant(
            "train_step_ms_256_e2e_u8", "uint8",
            f"ms/step incl. uint8-wire input ({cores} host cores)")
    except Exception as exc:
        print(f"uint8 e2e bench failed: {exc}", file=sys.stderr)
    return e2e_ms


def bench_finetune_230(iters=230):
    """BASELINE's second north-star: the 230-iteration avatar fine-tune in
    < 60 s (reference: 125-560 iterations of ``train.py --config
    finetuning-base`` on one GPU; RAdam lr 5e-4/8e-4, batch 8, 256² —
    ``configs/finetuning-base.yaml:3-6``, ``batched_finetune.py:99``).

    The driver-recorded metric is the wall-clock of ``iters`` steps of the
    REAL fine-tune program (RAdam, EMA alpha 0.972, finetune_embedding +
    1-row discriminator W, the 5 fine-tune losses — finetuning-base drops
    dis_embed), measured once the program is compiled: batched_finetune
    compiles once and reuses the program across all 30 avatars, and the
    persistent TPU compilation cache covers fresh processes.  The one-time
    compile is reported separately."""
    import jax
    import numpy as np

    from latentpose_tpu.losses import (adversarial, dice, featmat,
                                       idt_embed, perceptual)
    from latentpose_tpu.models.discriminators import no_landmarks as dis_mod
    from latentpose_tpu.models.embedders import (
        unsupervised_pose_separate_embResNeXt_segmentation as emb_mod)
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)
    from latentpose_tpu.runners import build, finetune as ft, holycow

    batch = 8
    args = types.SimpleNamespace(
        image_size=256, in_channels=3, out_channels=3, num_channels=64,
        max_num_channels=512, embed_channels=512, pose_embedding_size=256,
        gen_padding="zero", gen_constant_input_size=4,
        gen_num_residual_blocks=2, norm_layer="in", dis_padding="zero",
        dis_num_blocks=7, num_labels=1, optimizer="RAdam", lr_gen=5e-4,
        lr_dis=8e-4, beta1=0.0, average_function="sum", finetune=True,
        iteration=0, set_eval_mode_in_train=False, batch_size=batch,
        random_seed=0, gan_type="gan", fm_weight=10.0, dice_weight=1.0,
        perc_weight=3e-2, idt_embed_weight=0.6e-2,
        vgg_weights_dir="", allow_random_vgg=True,
        compute_dtype="bfloat16")

    models = {"embedder": emb_mod.Wrapper.get_net(args),
              "generator": gen_mod.Wrapper.get_net(args),
              "discriminator": ft.make_finetune_discriminator(
                  dis_mod.Wrapper, args)}
    criteria = [idt_embed.Wrapper.get_net(args),
                perceptual.Wrapper.get_net(args),
                adversarial.Criterion(args.gan_type),
                featmat.Criterion(args.fm_weight),
                dice.Criterion(args.dice_weight)]
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": dis_mod})
    rng = jax.random.PRNGKey(0)
    state = build.init_train_state(args, models, opt_g, opt_d, rng,
                                   finetune=True)
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d,
                                      donate=True)

    rnd = np.random.RandomState(0)
    batch_data = jax.device_put({
        "pose_input_rgbs": rnd.rand(batch, 1, 256, 256,
                                    3).astype(np.float32),
        "target_rgbs": rnd.rand(batch, 1, 256, 256, 3).astype(np.float32),
        "real_segm": rnd.rand(batch, 1, 256, 256, 1).astype(np.float32),
        "label": np.zeros((batch,), np.int32),
    })

    t0 = time.perf_counter()
    state, _ = step_fn(state, batch_data, rng)
    jax.block_until_ready(state.params)
    compile_s = time.perf_counter() - t0
    print(json.dumps({
        "metric": "finetune_compile_s",
        "value": round(compile_s, 1),
        "unit": "s one-time compile (amortized over 30 avatars / cached)",
        "vs_baseline": round(60.0 / max(compile_s, 1e-9), 3),
    }))
    sys.stdout.flush()

    t0 = time.perf_counter()
    for i in range(iters):
        state, _ = step_fn(state, batch_data, jax.random.fold_in(rng, i))
    jax.block_until_ready(state.params)
    total_s = time.perf_counter() - t0
    print(json.dumps({
        "metric": "finetune_230_iter_s",
        "value": round(total_s, 2),
        "unit": f"s wall-clock for {iters} fine-tune iters (1 chip)",
        "vs_baseline": round(60.0 / total_s, 3),
    }))
    sys.stdout.flush()
    return total_s


def main():
    import jax
    import jax.numpy as jnp

    from latentpose_tpu.models.embedders import (
        unsupervised_pose_separate_embResNeXt_segmentation as emb_mod)
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)

    n_chips = len(jax.devices())
    image_size = 256
    batch = 256  # post-decoder-optimization sweep on v5e (bf16:
    #              128->1739, 192->1614, 256->1805 fps; int8: 128->2304,
    #              256->2308) — 256 wins for bf16, flat for int8.
    #              Re-swept for int8_static in round 5 (the serializing
    #              absmax reduce is gone): 128->2488, 256->2493,
    #              384->HBM OOM — still flat, 256 stays optimal

    args = types.SimpleNamespace(
        image_size=image_size, in_channels=3, out_channels=3,
        num_channels=64, max_num_channels=512, embed_channels=512,
        pose_embedding_size=256, gen_padding="zero",
        gen_constant_input_size=4, gen_num_residual_blocks=2,
        norm_layer="in", average_function="sum",
        compute_dtype="bfloat16")

    embedder = emb_mod.Wrapper.get_net(args)
    generator = gen_mod.Wrapper.get_net(args)
    # int8_static serving path: per-tensor calibrated activation scales —
    # measured fastest (2491 vs 2302 dynamic vs 1810 bf16 fps on v5e; see
    # ops/quant.py for the measured design rejections)
    args_q = types.SimpleNamespace(**{**vars(args),
                                      "quantize": "int8_static"})
    generator_q = gen_mod.Wrapper.get_net(args_q)
    args_dyn = types.SimpleNamespace(**{**vars(args), "quantize": "int8"})
    generator_dyn = gen_mod.Wrapper.get_net(args_dyn)

    rng = jax.random.PRNGKey(0)
    emb_vars = embedder.init(
        rng, jnp.zeros((1, 1, image_size, image_size, 3)),
        jnp.zeros((1, 1, image_size, image_size, 3)))
    gen_vars = generator.init(
        rng, {"embeds": jnp.zeros((1, 512)),
              "pose_embedding": jnp.zeros((1, 256))})
    identity = jax.random.normal(rng, (1, 512))

    cd = jnp.bfloat16

    def make_drive_step(gen, calib=None):
        @jax.jit
        def drive_step(frames):
            pose = embedder.apply(emb_vars, frames.astype(cd)[:, None],
                                  train=False, method="get_pose_embedding")
            idt = jnp.broadcast_to(identity, (frames.shape[0], 512))
            variables = dict(gen_vars)
            if calib is not None:
                variables["quant_calib"] = calib
            rgbs, _ = gen.apply(
                variables, {"embeds": idt.astype(cd),
                            "pose_embedding": pose.astype(cd)},
                update_stats=False)
            return rgbs  # bf16 on device; video writer converts on host
        return drive_step

    frames = jax.device_put(
        np.random.rand(batch, image_size, image_size, 3).astype(np.float32))

    def calibrate_int8():
        """One-batch activation-scale calibration through the dynamic-quant
        generator (the production drive CLI calibrates the same way on the
        first driver frames — runners/drive.calibrate_quant_scales)."""
        pose = embedder.apply(emb_vars, frames.astype(cd)[:, None],
                              train=False, method="get_pose_embedding")
        idt = jnp.broadcast_to(identity, (batch, 512))
        _, mut = generator_dyn.apply(
            gen_vars, {"embeds": idt.astype(cd),
                       "pose_embedding": pose.astype(cd)},
            update_stats=False, mutable=["quant_calib"])
        return mut["quant_calib"]

    def measure(drive_step, n_iters=20):
        compiled = drive_step.lower(frames).compile()
        compiled(frames).block_until_ready()  # warmup
        start = time.perf_counter()
        in_flight = []
        for _ in range(n_iters):
            in_flight.append(compiled(frames))
            if len(in_flight) > 2:  # keep the device queue fed
                in_flight.pop(0).block_until_ready()
        for out in in_flight:
            out.block_until_ready()
        fps = batch * n_iters / (time.perf_counter() - start)
        return fps, compiled

    # Target: 2000 fps on 8 chips -> scale to this run's chip count.
    target = 2000.0 * n_chips / 8.0

    # int8_static serving path (drive --quantize int8_static; approximate,
    # see ops/quant.py) — reported as a secondary metric
    fps_q = None
    try:
        calib = calibrate_int8()
        fps_q, compiled_q = measure(make_drive_step(generator_q, calib))
        emit_mfu("drive_mfu_int8", compiled_flops(compiled_q),
                 batch / fps_q, int8=True)
        print(json.dumps({
            "metric": "drive_fps_256_int8",
            "value": round(fps_q, 1),
            "unit": "frames/s",
            "vs_baseline": round(fps_q / target, 3),
        }))
        sys.stdout.flush()
    except Exception as exc:
        print(f"int8 drive bench failed: {exc}", file=sys.stderr)

    # headline: the exact bf16 path (last line, driver-recorded)
    fps, compiled_bf16 = measure(make_drive_step(generator))
    emit_mfu("drive_mfu", compiled_flops(compiled_bf16), batch / fps)
    if fps_q is not None:
        # guard the int8 speed claim itself (VERDICT r2 Weak #3): the
        # quantized path must stay meaningfully faster than exact bf16
        # (measured 1.21-1.32x across rounds) or it has regressed
        print(json.dumps({
            "metric": "drive_int8_speedup",
            "value": round(fps_q / fps, 3),
            "unit": "x vs exact bf16",
            "vs_baseline": round((fps_q / fps) / 1.2, 3),
        }))
        if fps_q / fps < 1.2:
            print(f"WARNING: int8 speedup regressed below 1.2x "
                  f"({fps_q / fps:.2f}x)", file=sys.stderr)
    print(json.dumps({
        "metric": "drive_fps_256",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / target, 3),
    }))
    return fps


if __name__ == "__main__":
    # Persistent XLA compilation cache (TPU-only, see utils/compile_cache):
    # the bench programs are identical round to round, so warm runs skip
    # the ~minutes of compile time and measure only execution.
    from latentpose_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()
    try:
        bench_train_step(with_augs=True)   # reference-parity headline
        bench_train_step(with_augs=False)  # ablation: augmentation cost
    except Exception as exc:  # train bench must never mask the headline
        print(f"train_step bench failed: {exc}", file=sys.stderr)
    try:
        bench_finetune_230()               # BASELINE north-star #2
    except Exception as exc:
        print(f"finetune bench failed: {exc}", file=sys.stderr)
    sys.exit(0 if main() > 0 else 1)
