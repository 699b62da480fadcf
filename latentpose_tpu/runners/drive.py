"""Driving (inference) engine.

Parity with reference ``drive.py:73-98`` — fine-tuned avatar puppeteered by a
driver sequence: per frame, pose encoder -> generator -> side-by-side
(driver | result) video — but re-designed for TPU throughput:

- the reference runs batch_size=1 per frame in a Python loop
  (``drive.py:57,84-98``); here frames are processed in large batches through
  ONE jitted program (pose encoder + generator fused), optionally in
  bfloat16, with double-buffered host transfers — this is what makes the
  >=2000 fps target reachable (BASELINE.md);
- EMA weights are used (reference ``drive.py:65-68``), identity comes from
  the fine-tuned embedding in the train state.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _prepare_drive(models, args, use_ema):
    """Shared input-prep for the drive step and the int8 calibration pass:
    (state, pose_frames) -> (gen_params, gen_spectral, gen_inputs)."""
    embedder = models["embedder"]
    generator = models["generator"]
    compute_dtype = jnp.bfloat16 \
        if getattr(args, "compute_dtype", "float32") == "bfloat16" \
        else jnp.float32

    # self-contained generators (X2Face) consume identity images + driver
    # frames directly instead of embeddings
    self_contained = "enc_rgbs" in getattr(generator, "INPUT_KEYS", ())

    def prepare(state, pose_frames):
        emb_params = (state.ema_params.get("embedder")
                      if use_ema else None) or state.params["embedder"]
        gen_params = (state.ema_params.get("generator")
                      if use_ema else None) or state.params["generator"]

        bsz = pose_frames.shape[0]
        if pose_frames.dtype == jnp.uint8:
            # uint8 wire format: video/image sources decode to uint8 anyway,
            # so shipping bytes and dividing on device is lossless vs the
            # reference's host-side /255 — and 4x less host->device traffic
            x = (pose_frames.astype(jnp.float32) / 255.0).astype(
                compute_dtype)
        else:
            x = pose_frames.astype(compute_dtype)
        if self_contained:
            idt_imgs = state.params["finetune_identity_images"]
            gen_inputs = {
                "enc_rgbs": jnp.broadcast_to(
                    idt_imgs, (bsz,) + idt_imgs.shape[1:]).astype(
                        compute_dtype),
                "pose_input_rgbs": x[:, None]}
        else:
            pose = embedder.apply(
                {"params": emb_params,
                 "batch_stats": state.batch_stats["embedder"],
                 "spectral": state.spectral.get("embedder", {})},
                x[:, None], train=False, method="get_pose_embedding")
            identity = state.params["finetune_embedding"]
            if use_ema and "finetune_embedding" in state.ema_params:
                identity = state.ema_params["finetune_embedding"]
            idt = jnp.broadcast_to(identity, (bsz,) + identity.shape[1:])
            gen_inputs = {"embeds": idt.astype(compute_dtype),
                          "pose_embedding": pose.astype(compute_dtype)}
        return gen_params, state.spectral["generator"], gen_inputs

    return prepare


def make_drive_fn(models, args, use_ema: bool = True, quant_calib=None):
    """Build the jitted frame-batch driver: (state, pose_frames) -> rgb.

    pose_frames: (B, H, W, 3) float32 in [0, 1] OR uint8 (the wire format —
    dequantized on device).  Returns (B, H, W, 3) fake_rgbs.

    ``quant_calib``: the calibrated activation-scale collection for
    ``--quantize int8_static`` generators (see ``calibrate_quant_scales``);
    closed over, so the export path bakes the scales into the artifact.
    """
    generator = models["generator"]
    prepare = _prepare_drive(models, args, use_ema)

    def drive_step(state, pose_frames):
        gen_params, gen_spectral, gen_inputs = prepare(state, pose_frames)
        variables = {"params": gen_params, "spectral": gen_spectral}
        if quant_calib is not None:
            variables["quant_calib"] = quant_calib
        rgbs, segm = generator.apply(variables, gen_inputs,
                                     update_stats=False)
        segm = jnp.ones_like(rgbs[..., :1]) if segm is None else segm
        return rgbs.astype(jnp.float32), segm.astype(jnp.float32)

    return jax.jit(drive_step)


def calibrate_quant_scales(models, args, state, frames, batch_size=32,
                           use_ema: bool = True):
    """Static-int8 calibration pass (``--quantize int8_static``): run the
    DYNAMIC-quant generator over calibration frames with the 'quant_calib'
    collection mutable, accumulating each quantized conv's per-input-
    channel running absmax (ops/quant.py).  Returns the collection to pass
    to ``make_drive_fn(..., quant_calib=...)`` on the static generator.

    ``models['generator']`` here must be the dynamic-int8 module
    (quantize=True, quant_static=False) — calibration observes the same
    activation distributions serving will see, without needing the static
    scales it is about to produce."""
    generator = models["generator"]
    prepare = _prepare_drive(models, args, use_ema)

    @jax.jit
    def calib_step(state, pose_frames, calib):
        gen_params, gen_spectral, gen_inputs = prepare(state, pose_frames)
        variables = {"params": gen_params, "spectral": gen_spectral}
        if calib:
            variables["quant_calib"] = calib
        _, mut = generator.apply(variables, gen_inputs, update_stats=False,
                                 mutable=["quant_calib"])
        return mut["quant_calib"]

    calib = {}
    n = len(frames)
    for start in range(0, n, batch_size):
        chunk = np.asarray(frames[start:start + batch_size])
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0)
        calib = calib_step(state, jnp.asarray(chunk), calib)
    return jax.device_get(calib)


def drive_sequence(drive_fn, state, frames, batch_size=32, mesh=None):
    """Drive a full sequence; frames: (N, H, W, 3) float32 host array.

    Returns (N, H, W, 3) results.  Pads the tail batch to keep one compiled
    shape (SURVEY.md §7: static shapes); with a mesh, frame batches are
    sharded over the 'data' axis (multi-chip serving) and dispatch is
    pipelined so the device queue stays fed.
    """
    from latentpose_tpu.parallel.mesh import batch_sharding
    sharding = batch_sharding(mesh) if mesh is not None else None

    n = len(frames)
    in_flight = []
    outputs = []
    for start in range(0, n, batch_size):
        chunk = frames[start:start + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0)
        device_chunk = jnp.asarray(chunk)
        if sharding is not None:
            device_chunk = jax.device_put(device_chunk, sharding)
        rgbs, _ = drive_fn(state, device_chunk)
        in_flight.append((rgbs, pad))
        if len(in_flight) > 2:
            done, done_pad = in_flight.pop(0)
            outputs.append(np.asarray(done)[:batch_size - done_pad
                                            if done_pad else None])
    for done, done_pad in in_flight:
        outputs.append(np.asarray(done)[:batch_size - done_pad
                                        if done_pad else None])
    return np.concatenate(outputs, axis=0)
