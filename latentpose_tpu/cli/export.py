"""Serving export: ahead-of-time compile the fine-tuned drive step into a
self-contained StableHLO artifact (``jax.export``).

The artifact bakes the avatar's weights (EMA-preferred, exactly what
``drive.py`` serves) in as constants, so a serving host needs neither this
package, the model zoo, nor the checkpoint store — just::

    from jax import export
    serve = export.deserialize(Path("avatar.stablehlo").read_bytes()).call
    rgbs, segm = serve(frame_batch)   # uint8/float32 (B, H, W, 3)

The reference has no deployment story beyond re-running its python drive
loop (``/root/reference/drive.py:84-98``, batch-1 fp32); this is the
TPU-native one: a single lowered XLA program per (batch size, wire dtype),
optionally multi-platform (``--platforms tpu,cpu``) so the same artifact is
smoke-checkable off-chip, and composable with ``--quantize int8`` for the
2x-throughput MXU serving path.

Usage::

    python -m latentpose_tpu.cli.export CHECKPOINT \
        --destination avatar.stablehlo --export_batch_size 32
"""

import json
import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp

from latentpose_tpu.config import build_core_parser, get_args_and_modules
from latentpose_tpu.runners import drive as drive_lib

logger = logging.getLogger("latentpose_tpu.export")


def export_serving_artifact(models, state, args, batch_size, wire_dtype,
                            platforms=None, quant_calib=None):
    """Lower the drive step (weights closed over -> baked as constants)
    and return the serialized artifact bytes.  ``quant_calib``: calibrated
    activation scales for int8_static generators — baked in as constants
    alongside the weights."""
    drive_fn = drive_lib.make_drive_fn(models, args, use_ema=True,
                                       quant_calib=quant_calib)
    # jax.export requires the jitted callable itself; closing over `state`
    # turns every weight into a constant of the exported module.
    serve = jax.jit(lambda frames: drive_fn(state, frames))
    spec = jax.ShapeDtypeStruct(
        (batch_size, args.image_size, args.image_size, 3), wire_dtype)
    exported = jax.export.export(
        serve, platforms=list(platforms) if platforms else None)(spec)
    return exported.serialize(), exported


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = build_core_parser()
    parser.add("--destination", type=str, default="")
    parser.add("--export_batch_size", type=int, default=32)
    parser.add("--transfer_dtype", type=str, default="uint8",
               choices=["uint8", "float32"])
    # comma-separated lowering platforms ('' = the current backend only);
    # e.g. 'tpu,cpu' produces one artifact runnable on either
    parser.add("--platforms", type=str, default="")
    parser.add("--quantize", type=str, default="",
               choices=["", "int8", "int8_static"])
    parser.add("--calibration_source", type=str, default="synthetic://0",
               help="int8_static: driver frames for the activation-scale "
                    "calibration pass (dir / mp4 / synthetic://N); the "
                    "calibrated scales are baked into the artifact")
    parser.add("--calibration_frames", type=int, default=64)

    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and not argv[0].startswith("-"):
        argv = ["--checkpoint_path", argv.pop(0)] + argv

    args, _, modules, _ = get_args_and_modules(parser, argv=argv)
    if not args.checkpoint_path or not os.path.exists(
            os.path.join(args.checkpoint_path, "meta.json")):
        raise FileNotFoundError(
            f"Checkpoint `{args.checkpoint_path}` not found — export needs "
            "a fine-tuned checkpoint")
    # inference overrides, identical to drive.py (reference drive.py:48-59)
    args.finetune = True
    args.inference = True
    from latentpose_tpu.config.argparse_utils import flag_given
    if not flag_given(argv, "--compute_dtype"):
        args.compute_dtype = "bfloat16"

    from latentpose_tpu.cli.drive import load_driver_frames, load_finetuned
    models, state = load_finetuned(args, modules)

    quant_calib = None
    if args.quantize == "int8_static":
        import types as _types

        import numpy as np
        args_dyn = _types.SimpleNamespace(**vars(args))
        args_dyn.quantize = "int8"
        models_dyn = dict(models)
        models_dyn["generator"] = \
            modules["generators"].Wrapper.get_net(args_dyn)
        frames = load_driver_frames(args.calibration_source,
                                    args.image_size)
        frames = frames[:max(args.calibration_frames, 1)]
        if frames.dtype == np.uint8:
            frames = frames.astype(np.float32) / 255.0
        quant_calib = drive_lib.calibrate_quant_scales(
            models_dyn, args, state, frames,
            batch_size=min(args.export_batch_size, len(frames)))
        logger.info("int8_static: calibrated on %d frames from %s",
                    len(frames), args.calibration_source)

    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]
    wire_dtype = jnp.uint8 if args.transfer_dtype == "uint8" \
        else jnp.float32
    blob, exported = export_serving_artifact(
        models, state, args, args.export_batch_size, wire_dtype,
        platforms or None, quant_calib=quant_calib)

    dest = Path(args.destination or (
        Path(args.checkpoint_path) / "serving.stablehlo"))
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_bytes(blob)
    meta = {
        "batch_size": args.export_batch_size,
        "image_size": args.image_size,
        "transfer_dtype": args.transfer_dtype,
        "quantize": args.quantize,
        "platforms": list(exported.platforms),
        "iteration": int(state.step),
        "outputs": ["fake_rgbs", "fake_segm"],
        "bytes": len(blob),
    }
    dest.with_suffix(dest.suffix + ".json").write_text(
        json.dumps(meta, indent=1))
    logger.info("Exported %s (%.1f MiB, platforms=%s, iteration %d)",
                dest, len(blob) / 2**20, ",".join(exported.platforms),
                int(state.step))
    return str(dest)


if __name__ == "__main__":
    main()
