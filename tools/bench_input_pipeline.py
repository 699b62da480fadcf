#!/usr/bin/env python3
"""Host input-pipeline throughput vs the train step's appetite
(VERDICT r2 Missing #5 / Next #4).

Fabricates a VoxCeleb2-shaped on-disk tree (raw-resolution jpgs + bbox .npy
dict in the 256-scale VoxCeleb2.1 convention + segmentation pngs), then
measures the PRODUCTION flagship dataloader
(``voxceleb2_segmentation_nolandmarks`` -> BatchLoader thread-pool prefetch
-> native C++ decode+crop+resize, ``native/lpr_loader.cpp``) in frames/s.

The flagship meta-train step consumes batch 8 x (8 enc + 1 driver) = 72
decoded+cropped frames; at the benched step time the loader must sustain
72 / step_s frames/s or the epoch rate is data-starved (reference
counterpart: the prefetching DataLoader, ``dataloaders/dataloader.py:52-92``).

Usage: python tools/bench_input_pipeline.py [--step_ms 125.3] [--raw 384]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_tree(root: Path, num_identities=8, videos_per_id=2,
               frames_per_video=24, raw_size=384, image_size=256):
    import cv2
    bboxes = {}
    rng = np.random.RandomState(0)
    for i in range(num_identities):
        ident = f"id{i:05d}"
        bboxes[ident] = {}
        for v in range(videos_per_id):
            video = f"vid{v}"
            img_dir = root / "images-cropped" / ident / video
            segm_dir = root / "segmentation-cropped" / ident / video
            img_dir.mkdir(parents=True, exist_ok=True)
            segm_dir.mkdir(parents=True, exist_ok=True)
            rows = []
            for f in range(frames_per_video):
                img = (rng.rand(raw_size, raw_size, 3) * 255).astype(
                    np.uint8)
                cv2.imwrite(str(img_dir / f"{f:05d}.jpg"), img,
                            [cv2.IMWRITE_JPEG_QUALITY, 92])
                segm = np.zeros((raw_size, raw_size, 3), np.uint8)
                segm[raw_size // 4:-raw_size // 4,
                     raw_size // 4:-raw_size // 4] = 255
                cv2.imwrite(str(segm_dir / f"{f:05d}.png"), segm)
                # bbox in the 256-scale convention (SegmSampleLoader._bbox_for
                # divides by 256): a face box in the middle of the frame
                cx, cy = 128 + rng.randint(-8, 8), 128 + rng.randint(-8, 8)
                half = 48 + rng.randint(-4, 4)
                rows.append([cx - half, cy - half, cx + half, cy + half])
            bboxes[ident][video] = np.asarray(rows, np.float64)
    np.save(root / "bboxes.npy", bboxes, allow_pickle=True)
    return root / "bboxes.npy"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--step_ms", type=float, default=125.3,
                    help="benched train-step time the loader must outpace")
    ap.add_argument("--raw", type=int, default=384,
                    help="raw (pre-crop) frame resolution on disk")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_workers", type=int, default=0,
                    help="0 = 2x cpu count (BatchLoader threads)")
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--keep", default="")
    ns = ap.parse_args(argv)

    from latentpose_tpu.data import native_loader
    from latentpose_tpu.data.voxceleb2_segmentation_nolandmarks import \
        Wrapper

    root = Path(ns.keep) if ns.keep else Path(
        tempfile.mkdtemp(prefix="lpr_input_bench_"))
    bbox_path = build_tree(root, raw_size=ns.raw,
                           image_size=ns.image_size)

    ncpu = os.cpu_count() or 1
    workers = ns.num_workers or 2 * ncpu
    args = types.SimpleNamespace(
        data_root=str(root), img_dir="images-cropped",
        kp_dir="keypoints-cropped", segm_dir="segmentation-cropped",
        bboxes_dir=str(bbox_path), draw_oval=True,
        n_frames_for_encoder=8, image_size=ns.image_size,
        batch_size=ns.batch_size, random_seed=0, num_workers=workers,
        prefetch_size=16, inference=False, finetune=False,
        train_split_path="none.csv", data_split=None, num_labels=0,
        checkpoint_path="",
        use_pixelwise_augs=False, use_affine_scale=False,
        use_affine_shift=False)

    # --- attribution row: the bare C++ decode+crop+resize path -----------
    # (same jpgs, bypassing Python dataset assembly / segm / collate) so
    # the gap between "what the C++ pool can do" and "what the full loader
    # delivers" is visible per host core.
    jpgs = sorted((root / "images-cropped").rglob("*.jpg"))[:256]
    native_fps = None
    if native_loader.is_available():
        nl = native_loader.NativeBatchLoader()
        paths = [str(p) for p in jpgs]
        bbs = np.tile(np.asarray([[0.2, 0.2, 0.7, 0.7]], np.float64),
                      (len(paths), 1))
        has = np.ones((len(paths),), np.uint8)
        nl.load_cropped(paths, bbs, has, ns.image_size)  # warm file cache
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            nl.load_cropped(paths, bbs, has, ns.image_size)
        native_fps = len(paths) * reps / (time.perf_counter() - t0)

    loader = Wrapper.get_dataloader(args, part="train", phase="train")
    frames_per_sample = args.n_frames_for_encoder + 1  # 8 enc + 1 driver

    # warmup one batch (thread pool spin-up, file cache)
    it = iter(loader)
    next(it)

    t0 = time.perf_counter()
    done = 0
    while done < ns.batches:
        try:
            next(it)
        except StopIteration:
            it = iter(loader)
            continue
        done += 1
    secs = time.perf_counter() - t0
    it.close()  # stop the prefetch producer before tree teardown

    frames = done * ns.batch_size * frames_per_sample
    fps = frames / secs
    need = ns.batch_size * frames_per_sample / (ns.step_ms / 1e3)
    result = {
        "metric": "input_pipeline_frames_per_s",
        "value": round(fps, 1),
        "unit": "frames/s",
        "native_loader": native_loader.is_available(),
        "num_cpus": ncpu,
        "num_workers": workers,
        "raw_size": ns.raw,
        "needed_frames_per_s_at_step_ms": round(need, 1),
        "step_ms": ns.step_ms,
        "headroom_x": round(fps / need, 2),
        "native_decode_crop_only_fps": (round(native_fps, 1)
                                        if native_fps else None),
        "host_cores_needed_at_measured_rate": round(need / fps * ncpu, 1),
    }
    print(json.dumps(result))
    if not ns.keep:
        shutil.rmtree(root, ignore_errors=True)
    return result


if __name__ == "__main__":
    main()
