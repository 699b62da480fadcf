"""Drive (inference) entry point — parity with reference ``drive.py``.

Loads a fine-tuned checkpoint (EMA weights), then for every driver sequence
renders the avatar side-by-side with the driver into an mp4:

    python drive.py CHECKPOINT_PATH [DATA_ROOT] \
        --images_paths dir_or_video [...] --destination out_dir

Driver sources: a directory of images, a video file, or ``synthetic://K``
(procedural driver identity K — hermetic testing).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np
import jax

from latentpose_tpu import checkpoint as ckpt_lib
from latentpose_tpu.config import build_core_parser, get_args_and_modules
from latentpose_tpu.runners import build, drive as drive_lib, finetune as ft
from latentpose_tpu.utils.video import get_image_writer, to_uint8

logger = logging.getLogger("drive")


def load_driver_frames(path, image_size):
    """Load a driver sequence as (N, H, W, 3): uint8 for decoded image/video
    sources (the wire format — the drive step rescales on device, so the
    host never pays the x4 float conversion or transfer), float32 [0, 1]
    for synthetic/native-loader sources."""
    if str(path).startswith("synthetic://"):
        from latentpose_tpu.data.synthetic import render_face
        label = int(str(path).split("://", 1)[1])
        return np.stack([render_face(label, f, image_size)[0]
                         for f in range(32)])

    path = Path(path)
    frames = []
    if path.is_dir():
        files = sorted(p for p in path.iterdir()
                       if p.suffix.lower() in (".jpg", ".jpeg", ".png",
                                               ".bmp"))
        # fast path: C++ thread-pool decode+resize (native/lpr_loader.cpp)
        from latentpose_tpu.data import native_loader
        if native_loader.is_available():
            images, failed = native_loader.NativeBatchLoader().load(
                [str(p) for p in files], image_size)
            if failed == 0:
                return images
        import cv2
        for p in files:
            img = cv2.imread(str(p))[..., ::-1]
            frames.append(cv2.resize(img, (image_size, image_size)))
    else:
        import cv2
        cap = cv2.VideoCapture(str(path))
        while True:
            ok, img = cap.read()
            if not ok:
                break
            frames.append(cv2.resize(img[..., ::-1],
                                     (image_size, image_size)))
        cap.release()
    if not frames:
        raise FileNotFoundError(f"No frames found in {path}")
    return np.stack(frames)


def load_raw_frames(path):
    """Load a driver sequence at ORIGINAL resolution.

    Returns (frames, ids): uint8 RGB arrays and per-frame integer ids
    (image stem when numeric — the bbox-dict key contract of the dataset —
    else the positional index)."""
    import cv2
    path = Path(path)
    frames, ids = [], []
    if path.is_dir():
        files = sorted(p for p in path.iterdir()
                       if p.suffix.lower() in (".jpg", ".jpeg", ".png",
                                               ".bmp"))
        for idx, p in enumerate(files):
            img = cv2.imread(str(p))
            if img is None:
                raise FileNotFoundError(f"Unreadable image {p}")
            frames.append(img[..., ::-1])
            ids.append(int(p.stem) if p.stem.isdigit() else idx)
    else:
        cap = cv2.VideoCapture(str(path))
        while True:
            ok, img = cap.read()
            if not ok:
                break
            ids.append(len(frames))
            frames.append(img[..., ::-1])
        cap.release()
    if not frames:
        raise FileNotFoundError(f"No frames found in {path}")
    return frames, ids


def inline_crop_frames(path, args):
    """Crop raw driver footage inline, exactly as the inference dataloader
    does (reference ``drive.py:73-98`` drives through its dataset's bbox-npy
    crop): per-frame bbox (precomputed ``--bboxes_dir`` .npy dict, or S3FD
    detection when converted weights exist) -> square x1.8 -> blur-fade
    padded crop -> resize to ``--image_size``.  Returns (N, S, S, 3) f32."""
    import cv2

    from latentpose_tpu.data.common import crop as crop_lib

    frames, frame_ids = load_raw_frames(path)

    bboxes = {}
    try:
        bboxes = np.load(str(args.bboxes_dir), allow_pickle=True).item()
    except (FileNotFoundError, OSError, ValueError):
        pass
    identity, sequence = (["", ""] + str(path).rstrip("/").split("/"))[-2:]

    detector = None
    if not bboxes:
        from latentpose_tpu.preprocess.croppers import make_face_detector
        detector = make_face_detector(None)  # env / <repo>/weights discovery
        if detector is None:
            raise RuntimeError(
                "--crop needs per-frame bboxes: provide --bboxes_dir "
                "(precomputed .npy dict, the dataset contract) or converted "
                "S3FD weights (see WEIGHTS.md). Alternatively pre-crop with "
                "cli/crop_as_in_dataset.py and drive without --crop.")

    out = []
    size = args.image_size
    for idx, img in zip(frame_ids, frames):
        h, w = img.shape[:2]
        try:
            raw = bboxes[identity][sequence][idx]
            l, t, r, b = (np.asarray(raw, np.float32) / 256.0).tolist()
        except (KeyError, ValueError, IndexError):
            if detector is not None:
                from latentpose_tpu.preprocess.croppers import \
                    choose_one_detection
                lp, tp, rp, bp = choose_one_detection(detector(img))[:4]
                l, t, r, b = lp / w, tp / h, rp / w, bp / h
            else:
                l, t, r, b = 0.0, 0.0, 1.0, 1.0  # assume pre-cropped frame
        if (l, t, r, b) != (0.0, 0.0, 1.0, 1.0):
            l, t, r, b = crop_lib.square_and_scale_bbox(l, t, r, b)
            ti, li, bi, ri = crop_lib.bbox_to_integer_coords(t, l, b, r, h, w)
            img = crop_lib.crop_with_padding(img, ti, li, bi, ri)
        interp = cv2.INTER_CUBIC if size > img.shape[0] else cv2.INTER_AREA
        img = cv2.resize(img, (size, size), interpolation=interp)
        out.append(img.astype(np.float32) / 255.0)
    return np.stack(out)


def load_finetuned(args, modules):
    """Rebuild the module set + restore a fine-tuned checkpoint for
    inference (shared by drive and the serving exporter)."""
    rng = jax.random.PRNGKey(args.random_seed)
    models = build.build_models(args, modules)
    models["discriminator"] = ft.make_finetune_discriminator(
        modules["discriminators"].Wrapper, args)
    opt_g, opt_d = build.build_optimizers(args, modules)
    # skeleton leaf names must match the checkpoint's avatar trainables
    # (finetune_embedding / finetune_affine / X2Face identity images) in
    # both params and ema_params, or from_state_dict drops the saved values
    saved_params = ckpt_lib.load_arrays(args.checkpoint_path).get("params",
                                                                  {})
    finetune_leaves = {k: v for k, v in saved_params.items()
                       if k.startswith("finetune_")} or None
    skeleton = build.init_train_state(args, models, opt_g, opt_d, rng,
                                      finetune=True,
                                      finetune_leaves=finetune_leaves)
    state = ckpt_lib.restore_state(args.checkpoint_path, skeleton)
    logger.info("Loaded fine-tuned checkpoint %s (iteration %d)",
                args.checkpoint_path, int(state.step))
    return models, state


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    from latentpose_tpu.utils.compile_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    parser = build_core_parser()
    parser.add("--images_paths", type=str, nargs="+", default=[])
    parser.add("--destination", type=str, default="driving_results")
    parser.add("--drive_batch_size", type=int, default=32)
    # Inline cropping of raw footage (reference drive.py crops through its
    # inference dataloader; we expose it as an explicit flag)
    parser.add("--crop", action="store_bool", default=False)
    # int8 MXU serving path (~2x conv throughput on v5e; approximate —
    # see ops/quant.py). '' = exact bf16/f32 path; 'int8' = dynamic
    # per-call activation scales; 'int8_static' = static scales calibrated
    # on the first driver batches (per-tensor at serve time; no per-call
    # absmax reduce) + bf16 epilogues — fastest, see ops/quant.py.
    parser.add("--quantize", type=str, default="",
               choices=["", "int8", "int8_static"])
    parser.add("--calibration_frames", type=int, default=64,
               help="int8_static: how many leading driver frames feed the "
                    "activation-scale calibration pass")

    # Reference CLI: ``drive.py CHECKPOINT [DATA_ROOT] --images_paths ...``;
    # rewrite positionals to flags *before* resolution so the saved
    # checkpoint args merge in (resolution level 2).
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and not argv[0].startswith("-"):
        argv = ["--checkpoint_path", argv.pop(0)] + argv
    if len(argv) > 2 and not argv[2].startswith("-"):
        argv = argv[:2] + ["--data_root", argv[2]] + argv[3:]

    args, _, modules, _ = get_args_and_modules(parser, argv=argv)
    if not args.checkpoint_path or not os.path.exists(
            os.path.join(args.checkpoint_path, "meta.json")):
        raise FileNotFoundError(
            f"Checkpoint `{args.checkpoint_path}` not found — drive needs a "
            "fine-tuned checkpoint")
    # inference overrides (reference drive.py:48-59)
    args.finetune = True
    args.inference = True
    # serving default: bf16 unless the user pinned a dtype on the CLI
    # (prefix-aware: catches --compute_dtype=float32 too, ADVICE r4)
    from latentpose_tpu.config.argparse_utils import flag_given
    if not flag_given(argv, "--compute_dtype"):
        args.compute_dtype = "bfloat16"

    models, state = load_finetuned(args, modules)

    drive_fn = None
    if args.quantize != "int8_static":
        drive_fn = drive_lib.make_drive_fn(models, args, use_ema=True)
    # int8_static: the drive fn is built lazily after calibrating the
    # activation scales on the first driver sequence's leading frames

    # multi-chip serving: shard frame batches over the data axis
    mesh = None
    num_devices = args.num_devices or 1
    if num_devices > 1:
        from latentpose_tpu.parallel.mesh import create_mesh, replicate
        mesh = create_mesh(num_devices)
        state = replicate(state, mesh)

    os.makedirs(args.destination, exist_ok=True)
    results = []
    for images_path in args.images_paths:
        # reference semantics: driver dirs are relative to
        # <data_root>/<img_dir> when a data_root is given
        resolved = images_path
        if args.data_root and not str(images_path).startswith("synthetic"):
            candidate = Path(args.data_root) / args.img_dir / images_path
            if candidate.exists():
                resolved = candidate
        if args.crop and not str(resolved).startswith("synthetic"):
            frames = inline_crop_frames(resolved, args)
        else:
            frames = load_driver_frames(resolved, args.image_size)
        if drive_fn is None:  # --quantize int8_static, first sequence
            import types as _types
            args_dyn = _types.SimpleNamespace(**vars(args))
            args_dyn.quantize = "int8"
            models_dyn = dict(models)
            models_dyn["generator"] = \
                modules["generators"].Wrapper.get_net(args_dyn)
            calib_frames = frames[:max(args.calibration_frames, 1)]
            if calib_frames.dtype == np.uint8:
                calib_frames = calib_frames.astype(np.float32) / 255.0
            calib = drive_lib.calibrate_quant_scales(
                models_dyn, args, state, calib_frames,
                batch_size=args.drive_batch_size)
            logger.info("int8_static: calibrated activation scales on %d "
                        "frames (%d quantized convs)", len(calib_frames),
                        len(jax.tree_util.tree_leaves(calib)))
            drive_fn = drive_lib.make_drive_fn(models, args, use_ema=True,
                                               quant_calib=calib)
        outputs = drive_lib.drive_sequence(
            drive_fn, state, frames, batch_size=args.drive_batch_size,
            mesh=mesh)

        name = str(images_path).replace("://", "_").replace("/", "_")
        dest = Path(args.destination) / f"{name}.mp4"
        writer = get_image_writer(dest)
        for driver, result in zip(frames, outputs):
            if driver.dtype == np.uint8:  # uint8 wire format
                driver = driver.astype(np.float32) / 255.0
            side_by_side = np.concatenate([driver, result], axis=1)
            writer.add(to_uint8(side_by_side))
        writer.close()
        logger.info("Wrote %s (%d frames)", dest, len(frames))
        results.append(dest)
    return results


if __name__ == "__main__":
    main()
