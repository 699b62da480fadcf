"""Epoch loop — the host-side orchestration around the jitted train step.

Parity with reference ``runners/holycow.py:212-402``: per-iteration scalar
logging via Meter, periodic EMA-weights visualization, Data_time/Batch_time
meters, iteration counter semantics.  The compute (G step, D step, EMA, all
losses) is entirely inside the jitted step; this loop only feeds batches and
logs.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from latentpose_tpu.parallel.mesh import shard_batch
from latentpose_tpu.runners.holycow import forward
from latentpose_tpu.utils.meter import Meter
from latentpose_tpu.utils.visualize import make_visual

# image keys quantized on the wire under --transfer_dtype uint8
_TRANSFER_IMAGE_KEYS = ("enc_rgbs", "pose_input_rgbs", "target_rgbs",
                        "real_segm", "enc_stickmen", "dec_stickmen")


def dequantize_batch_host(batch):
    """Host-side inverse of the uint8 wire format, for the infrequent aux
    paths (fixed probes, validation, finetune ê) that consume raw loader
    batches — with ``--transfer_dtype uint8`` the loaders may emit uint8
    directly (e.g. data/synthetic.py's render-cache wire path)."""
    return {k: (np.asarray(v, np.float32) / 255.0
                if getattr(v, "dtype", None) == np.uint8 else v)
            for k, v in batch.items()}


def quantize_batch_u8(batch):
    """Host side of --transfer_dtype uint8: [0,1] f32 image arrays ->
    uint8 bytes (the jitted step rescales on device —
    runners/holycow.dequantize_batch).  4x fewer host->device bytes."""
    out = dict(batch)
    for key in _TRANSFER_IMAGE_KEYS:
        value = out.get(key)
        if value is not None and getattr(value, "dtype", None) == np.float32:
            out[key] = (value * 255.0 + 0.5).astype(np.uint8)
    return out


def device_prefetch(dataloader, args, mesh, depth=3):
    """Iterate (data_dict, target_dict) pairs as device-resident batches,
    issuing host->device transfers up to ``depth`` batches ahead of
    consumption FROM A DEDICATED PRODUCER THREAD.

    Two overlaps compose here (measured: train_step_ms_256_e2e* in BENCH):
    - JAX transfers are asynchronous, so the wire copy of batch N+k
      overlaps the device executing step N;
    - the host-side work per batch (the --transfer_dtype uint8 quantize
      pass and device_put's staging memcpy, which releases the GIL) runs
      in the producer thread, overlapping the consumer's step dispatch —
      on few-core hosts this is the difference between the feed
      serializing behind dispatch and riding alongside it.
    """
    import queue as queue_mod
    import threading

    def prepare(pair):
        data_dict, target_dict = pair
        batch = {**data_dict, **target_dict}
        if getattr(args, "transfer_dtype", "float32") == "uint8":
            batch = quantize_batch_u8(batch)
        if mesh is not None:
            return shard_batch(batch, mesh)
        return jax.device_put(batch)

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(1, depth))
    sentinel = object()
    stop = threading.Event()

    def producer():
        try:
            for pair in dataloader:
                item = prepare(pair)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue_mod.Full:
                        continue
                if stop.is_set():
                    return
            q.put(sentinel)
        except BaseException as exc:  # surface producer errors to consumer
            q.put(exc)

    thread = threading.Thread(target=producer, daemon=True,
                              name="lpt-device-prefetch")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()

logger = logging.getLogger("latentpose_tpu.loop")


def make_eval_forward(models, args):
    """No-loss forward with EMA weights for visualization (reference
    ``set_use_running_averages`` + ``set_compute_losses(False)``)."""
    finetune = bool(args.finetune)
    train_mode = not args.set_eval_mode_in_test
    use_ema = bool(getattr(args, "weights_running_average", True))

    def eval_forward(state, batch):
        params = dict(state.params)
        if use_ema:
            params["embedder"] = state.ema_params.get(
                "embedder", params["embedder"])
            params["generator"] = state.ema_params.get(
                "generator", params["generator"])
            if finetune and "finetune_embedding" in state.ema_params:
                params["finetune_embedding"] = \
                    state.ema_params["finetune_embedding"]
        data_dict, _, _ = forward(
            models, params, state.batch_stats, state.spectral, batch,
            rng=None, train=train_mode, finetune=finetune,
            update_stats=False, compute_losses=False)
        out = {"fake_rgbs": data_dict["fake_rgbs"]}
        if data_dict.get("fake_segm") is not None:  # no-segm families
            out["fake_segm"] = data_dict["fake_segm"]
        if data_dict.get("pose_embedding") is not None:
            out["pose_embedding"] = data_dict["pose_embedding"]
        return out

    return jax.jit(eval_forward)


def try_other_driving_images(dataloader, eval_forward, state, batch,
                             suffix, same_identity, deterministic=False):
    """Cross-driving visualization (reference ``holycow.py:266-316``): for
    each sample pick a different driver — same person/other video
    ('_other_video') or another person ('_other_person') — re-run the model
    with EMA weights, and stash the new driver/outputs under suffixed keys.
    """
    from latentpose_tpu.data.pipeline import default_collate
    dataset = getattr(dataloader, "dataset", None)
    if dataset is None or not hasattr(dataset, "get_other_sample_by_label"):
        return {}
    labels = [int(l) for l in np.asarray(batch["label"])]
    other_idx = [dataset.get_other_sample_by_label(
        l, same_identity=same_identity, deterministic=deterministic)
        for l in labels]
    data, target = default_collate([dataset[i] for i in other_idx])
    swapped = dict(batch)
    for key in ("pose_input_rgbs", "dec_stickmen", "dec_keypoints",
                "target_rgbs", "real_segm"):
        if key in data:
            swapped[key] = data[key]
        elif key in target:
            swapped[key] = target[key]
    outputs = eval_forward(state, swapped)
    result = {"pose_input_rgbs" + suffix: swapped["pose_input_rgbs"],
              "fake_rgbs" + suffix: np.asarray(outputs["fake_rgbs"])}
    return result


def run_fixed_id_eval(dataloader, eval_forward, state, args, writer,
                      metrics=()):
    """Deterministic fixed-sample probes (reference ``holycow.py:344-387``):
    re-evaluate ``fixed_val_ids`` with deterministic frame sampling, log a
    visual grid of the first batch + averaged metric values."""
    from latentpose_tpu.data.pipeline import default_collate
    dataset = getattr(dataloader, "dataset", None)
    if dataset is None or not args.fixed_val_ids:
        return
    ids = [i for i in args.fixed_val_ids if i < len(dataset)]
    if not ids:
        return
    was_deterministic = getattr(dataset.loader, "deterministic", None)
    if was_deterministic is not None:
        dataset.loader.deterministic = True
    try:
        metrics_meter = Meter()
        for start in range(0, len(ids), args.batch_size_inference):
            chunk = ids[start:start + args.batch_size_inference]
            data, target = default_collate([dataset[i] for i in chunk])
            fixed = dequantize_batch_host({**data, **target})
            # seeded deterministic augmentations, as the reference applies
            # to its fixed probes (imgaug re-seeded to 666 every round —
            # reference holycow.py:349-356).  The key is folded with the
            # chunk start so each probe chunk draws distinct (but
            # round-stable) augmentations, like the reference's advancing
            # imgaug RNG state.
            if (getattr(args, "use_pixelwise_augs", False)
                    or getattr(args, "use_affine_scale", False)
                    or getattr(args, "use_affine_shift", False)):
                import jax as _jax

                from latentpose_tpu.data.augmentation import (
                    augment_data_dict)
                fixed = {
                    k: (np.asarray(v) if hasattr(v, "shape") else v)
                    for k, v in augment_data_dict(
                        _jax.random.fold_in(_jax.random.PRNGKey(666), start),
                        fixed,
                        use_pixelwise=getattr(args, "use_pixelwise_augs",
                                              False),
                        use_scale=getattr(args, "use_affine_scale", False),
                        use_shift=getattr(args, "use_affine_shift", False),
                    ).items()}
            outputs = eval_forward(state, fixed)
            fixed.update({k: np.asarray(v) for k, v in outputs.items()})
            if start == 0 and writer is not None:
                grid, captions = make_visual(fixed, n_samples=len(chunk))
                writer.add_image("Fixed_images/train/visual", grid,
                                 captions, args.iteration)
            for metric in metrics:
                values, counts = metric(fixed)
                for name, value in values.items():
                    metrics_meter.add(name, value, counts.get(name, 1))
        if writer is not None:
            for name in metrics_meter.keys():
                writer.add_scalar(f"Fixed_metrics/train/{name}",
                                  metrics_meter.get_average(name),
                                  args.iteration)
    finally:
        if was_deterministic is not None:
            dataset.loader.deterministic = was_deterministic


def run_validation(dataloader, eval_forward, state, args, epoch,
                   writer=None, metrics=(), saver=None):
    """Post-epoch validation pass over the ``val`` part.

    The reference declares this but never implements it: ``--skip_eval``
    defaults True and the ``not skip_eval`` branch raises
    ``NotImplementedError("NYI: validation")`` (reference
    ``train.py:130-133,293-302``).  The commented-out sketch there runs the
    module with EMA weights and no losses over ``dataloader_val`` and feeds
    a ``Saver`` — which is exactly what this does: eval_forward (EMA
    weights, no grads), metric meters logged as ``Metrics/val/*``, a
    ``Images/val/visual`` grid of the first batch, and per-batch npz dumps
    through ``Saver`` when ``--saver`` is set.
    """
    meter = Meter()
    end = time.time()
    for it, (data_dict, target_dict) in enumerate(dataloader):
        meter.add("Data_time", time.time() - end)
        batch = dequantize_batch_host({**data_dict, **target_dict})
        outputs = eval_forward(state, batch)
        merged = {**batch, **{k: np.asarray(v) for k, v in outputs.items()}}
        for metric in metrics:
            values, counts = metric(merged)
            for name, value in values.items():
                meter.add(name, value, counts.get(name, 1))
        if it == 0 and writer is not None:
            grid, captions = make_visual(
                merged, n_samples=min(len(merged["fake_rgbs"]),
                                      args.num_visuals_per_img))
            writer.add_image("Images/val/visual", grid, captions,
                             args.iteration)
        if saver is not None:
            saver.save(epoch=epoch, iteration=args.iteration,
                       data={"fake_rgbs": merged["fake_rgbs"],
                             "fake_segm": merged.get("fake_segm"),
                             "label": merged.get("label")})
        meter.add("Batch_time", time.time() - end)
        end = time.time()
    if writer is not None:
        for name in meter.keys():
            writer.add_scalar(f"Metrics/val/{name}",
                              meter.get_average(name), args.iteration)
    logger.info("Validation after epoch %d: %s", epoch,
                {name: round(meter.get_average(name), 4)
                 for name in meter.keys()})
    return {name: meter.get_average(name) for name in meter.keys()}


def run_epoch(dataloader, step_fn, state, args, epoch, rng,
              mesh=None, writer=None, eval_forward=None, metrics=(),
              saver=None, state_holder=None):
    """Train one epoch; returns the new state.

    ``state_holder``: optional mutable dict whose ``"state"`` entry is
    refreshed after every step, so the SIGINT/SIGTERM save handler
    (cli/train.py) checkpoints the CURRENT model mid-epoch — reference
    semantics, where the handler reads the live module state
    (``train.py:176-194``)."""
    meter = Meter()
    end = time.time()

    # jax.profiler trace hooks (SURVEY.md §5: replaces the reference's dead
    # --profile_flops flag): trace steps [2, 2+profile_steps) of epoch 0.
    profile_dir = getattr(args, "profile_dir", "")
    profile_steps = int(getattr(args, "profile_steps", 5))
    profiling = False

    for it, batch in enumerate(device_prefetch(dataloader, args, mesh)):
        if profile_dir and epoch == 0:
            if it == 2:
                jax.profiler.start_trace(profile_dir)
                profiling = True
                logger.info("Profiler trace started -> %s", profile_dir)
            elif profiling and it == 2 + profile_steps:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
                logger.info("Profiler trace written to %s", profile_dir)
        meter.add("Data_time", time.time() - end)

        step_rng = jax.random.fold_in(rng, int(args.iteration))
        state, scalars = step_fn(state, batch, step_rng)
        if state_holder is not None:
            state_holder["state"] = state

        if args.detailed_metrics:
            for name, value in scalars.items():
                meter.add(name, float(value))

        if writer is not None:
            if args.iteration % args.log_frequency_loss == 0:
                for metric in meter.keys():
                    writer.add_scalar(f"Metrics/train/{metric}",
                                      meter.get_last(metric), args.iteration)
            if (args.iteration % args.log_frequency_images == 0
                    and eval_forward is not None):
                outputs = eval_forward(state, batch)
                # visuals render f32 [0,1]; undo the uint8 wire format
                shown = {k: (np.asarray(v, np.float32) / 255.0
                             if getattr(v, "dtype", None) == jnp.uint8
                             or getattr(v, "dtype", None) == np.uint8
                             else v)
                         for k, v in batch.items()}
                visual_dict = {**shown,
                               **{k: np.asarray(v)
                                  for k, v in outputs.items()}}
                if not args.finetune:
                    # cross-driving columns (reference holycow.py:324-342)
                    visual_dict.update(try_other_driving_images(
                        dataloader, eval_forward, state, batch,
                        "_other_video", same_identity=True))
                    visual_dict.update(try_other_driving_images(
                        dataloader, eval_forward, state, batch,
                        "_other_person", same_identity=False))
                grid, captions = make_visual(
                    visual_dict, n_samples=args.num_visuals_per_img)
                writer.add_image("Images/train/visual", grid, captions,
                                 args.iteration)
            if (args.iteration % args.log_frequency_fixed_images == 0
                    and eval_forward is not None):
                run_fixed_id_eval(dataloader, eval_forward, state, args,
                                  writer, metrics)
            args.iteration += 1
        else:
            args.iteration += 1

        if saver is not None:
            saver.save(epoch=epoch, iteration=args.iteration,
                       scalars={k: float(v) for k, v in scalars.items()})

        meter.add("Batch_time", time.time() - end)
        end = time.time()

    if profiling:
        jax.block_until_ready(state.params)
        jax.profiler.stop_trace()

    logger.info("Epoch %d finished (loss_G=%.4f loss_D=%.4f, %.3fs/it)",
                epoch, meter.get_average("loss_G"),
                meter.get_average("loss_D"),
                meter.get_average("Batch_time"))
    return state
