"""Crop faces exactly as the dataset pipeline does — parity with reference
``utils/crop_as_in_dataset.py`` (CLI contract: SOURCE DEST
--crop-style={latentpose,ffhq}).

SOURCE / DEST: image folder, video file, or single image (DEST: folder or
video).  Optionally saves landmarks (.npy per frame) next to the crops.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from latentpose_tpu.preprocess.croppers import make_cropper
from latentpose_tpu.preprocess.readers import ImageReader
from latentpose_tpu.utils.video import get_image_writer

logger = logging.getLogger("crop_as_in_dataset")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("source")
    parser.add_argument("destination")
    parser.add_argument("--crop-style", default="latentpose",
                        choices=["latentpose", "ffhq"])
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--save-landmarks", action="store_true")
    parser.add_argument("--landmarks-dir", type=str, default="")
    parser.add_argument("--weights_dir", type=str, default="data/weights")
    parser.add_argument("--bboxes_npy", type=str, default="",
                        help="Optional precomputed bbox dict (skip S3FD)")
    args = parser.parse_args(argv)

    cropper = make_cropper(args.crop_style,
                           (args.image_size, args.image_size),
                           weights_dir=args.weights_dir)
    reader = ImageReader.get_image_reader(args.source)

    dest = Path(args.destination)
    is_video = dest.suffix.lower() in (".mp4", ".avi", ".mkv")
    writer = get_image_writer(dest) if is_video else None
    if not is_video:
        dest.mkdir(parents=True, exist_ok=True)

    bboxes = {}
    if args.bboxes_npy:
        bboxes = np.load(args.bboxes_npy, allow_pickle=True).item()

    lm_dir = Path(args.landmarks_dir) if args.landmarks_dir else None
    if args.save_landmarks and lm_dir:
        lm_dir.mkdir(parents=True, exist_ok=True)

    count = 0
    for image, name in reader:
        bbox = bboxes.get(name)
        cropped, landmarks = cropper.crop_image(
            image, bbox=bbox, compute_landmarks=args.save_landmarks)
        if is_video:
            writer.add(cropped)
        else:
            from PIL import Image
            Image.fromarray(cropped).save(dest / f"{name}.jpg", quality=95)
        if args.save_landmarks and lm_dir is not None and \
                landmarks is not None:
            np.save(lm_dir / f"{name}.npy", landmarks)
        count += 1
    if writer:
        writer.close()
    logger.info("Cropped %d frames -> %s", count, dest)
    return count


if __name__ == "__main__":
    main()
