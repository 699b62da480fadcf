"""Dataset preprocessing orchestrator — python equivalent of the reference's
``utils/preprocess_dataset.sh`` (SURVEY.md §3.5):

  1. DO_DECODE_VIDEOS: video -> jpg frames (ffmpeg, host-side)
  2. DO_CROP: per identity, crop faces latentpose-style (+ landmarks)
  3. DO_COMPUTE_SEGMENTATION: head+body masks (multi-scale TTA)
  4. DO_CROP_FFHQ: optional FFHQ-style crops for the Zakharov reproduction

Output tree consumed by the dataloaders: images-cropped/,
keypoints-cropped/, segmentation-cropped/.
"""

from __future__ import annotations

import argparse
import logging
import shutil
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger("preprocess_dataset")

VIDEO_EXTENSIONS = (".mp4", ".avi", ".mkv", ".webm", ".mov")


def decode_videos(src_root: Path, dst_root: Path, fps: float = 0):
    """Stage 1: every video under src_root -> a folder of jpg frames."""
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not found on PATH")
    count = 0
    for video in sorted(src_root.rglob("*")):
        if video.suffix.lower() not in VIDEO_EXTENSIONS:
            continue
        out_dir = dst_root / video.relative_to(src_root).with_suffix("")
        out_dir.mkdir(parents=True, exist_ok=True)
        cmd = ["ffmpeg", "-y", "-loglevel", "error", "-i", str(video)]
        if fps:
            cmd += ["-vf", f"fps={fps}"]
        cmd += ["-qscale:v", "2", str(out_dir / "%06d.jpg")]
        subprocess.run(cmd, check=True)
        count += 1
    logger.info("Decoded %d videos", count)


def crop_identities(images_root: Path, out_images: Path, out_keypoints,
                    crop_style: str, image_size: int, weights_dir):
    """Stage 2/4: crop every identity/video folder of frames."""
    from latentpose_tpu.cli.crop_as_in_dataset import main as crop_main
    for folder in sorted(p for p in images_root.rglob("*") if p.is_dir()):
        frames = [f for f in folder.iterdir()
                  if f.suffix.lower() in (".jpg", ".jpeg", ".png")]
        if not frames:
            continue
        rel = folder.relative_to(images_root)
        argv = [str(folder), str(out_images / rel),
                "--crop-style", crop_style,
                "--image-size", str(image_size),
                "--weights_dir", str(weights_dir)]
        if out_keypoints is not None:
            argv += ["--save-landmarks",
                     "--landmarks-dir", str(out_keypoints / rel)]
        crop_main(argv)


def compute_segmentation(images_root: Path, out_root: Path, weights_dir):
    """Stage 3: masks for every cropped frame (TTA 0.75/1.0/1.5/2.0)."""
    import cv2
    from latentpose_tpu.preprocess.segmentation import (
        make_segmentation_backend, segment_with_tta)
    backend = make_segmentation_backend(weights_dir)
    for folder in sorted(p for p in images_root.rglob("*") if p.is_dir()):
        rel = folder.relative_to(images_root)
        out_dir = out_root / rel
        frames = sorted(f for f in folder.iterdir()
                        if f.suffix.lower() in (".jpg", ".jpeg", ".png"))
        if not frames:
            continue
        out_dir.mkdir(parents=True, exist_ok=True)
        for frame in frames:
            img = cv2.imread(str(frame))[..., ::-1]
            mask = segment_with_tta(backend, img)
            mask_u8 = (mask * 255).astype(np.uint8)
            cv2.imwrite(str(out_dir / (frame.stem + ".png")),
                        np.stack([mask_u8] * 3, axis=-1))


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=Path, required=True)
    parser.add_argument("--raw_videos_dir", type=str, default="")
    parser.add_argument("--raw_images_dir", type=str, default="images-raw")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--weights_dir", type=str, default="data/weights")
    parser.add_argument("--do_decode_videos", action="store_true")
    parser.add_argument("--do_crop", action="store_true")
    parser.add_argument("--do_compute_segmentation", action="store_true")
    parser.add_argument("--do_crop_ffhq", action="store_true")
    # Optional 3DMM pose/expression stage (reference
    # preprocess_dataset.sh:148-165 shells out to a PRIVATE python2
    # Expression-Net checkout — an external hook even there).  Exposed for
    # pipeline-ordering parity; requires an external estimator command.
    parser.add_argument("--do_compute_pose_3dmm", action="store_true")
    parser.add_argument("--pose_3dmm_command", type=str, default="",
                        help="External command invoked as "
                             "'<cmd> <images_list_file> <output_dir>' to "
                             "produce per-frame 3DMM coefficient .npy files")
    parser.add_argument("--fps", type=float, default=0)
    args = parser.parse_args(argv)

    root = args.data_root
    if args.do_decode_videos:
        decode_videos(root / args.raw_videos_dir, root / args.raw_images_dir,
                      args.fps)
    if args.do_crop:
        crop_identities(root / args.raw_images_dir, root / "images-cropped",
                        root / "keypoints-cropped", "latentpose",
                        args.image_size, args.weights_dir)
    if args.do_compute_segmentation:
        compute_segmentation(root / "images-cropped",
                             root / "segmentation-cropped", args.weights_dir)
    if args.do_compute_pose_3dmm:
        if not args.pose_3dmm_command:
            raise SystemExit(
                "--do_compute_pose_3dmm needs --pose_3dmm_command: the "
                "reference's stage shells out to a private Expression-Net "
                "checkout (utils/preprocess_dataset.sh:148-165); provide "
                "an equivalent external estimator command")
        import subprocess
        import tempfile
        images = sorted((root / "images-cropped").rglob("*.jpg"))
        with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                         delete=False) as f:
            f.write("\n".join(str(p) for p in images))
            list_file = f.name
        out_dir = root / "pose-3dmm"
        out_dir.mkdir(parents=True, exist_ok=True)
        subprocess.run(args.pose_3dmm_command.split()
                       + [list_file, str(out_dir)], check=True)
    if args.do_crop_ffhq:
        crop_identities(root / args.raw_images_dir,
                        root / "images-cropped-ffhq",
                        root / "keypoints-cropped-ffhq", "ffhq",
                        args.image_size, args.weights_dir)


if __name__ == "__main__":
    main()
