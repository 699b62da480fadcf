"""Landmark + segmentation dataset — parity with reference
``dataloaders/voxceleb2_segm.py``: voxceleb2.py's contract plus
segmentation-masked targets + real_segm."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from latentpose_tpu.data import augmentation
from latentpose_tpu.data.common import voxceleb
from latentpose_tpu.data.pipeline import BatchLoader
from latentpose_tpu.data.voxceleb2 import VoxCeleb2LandmarkDataset


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--draw_oval", default=True, action="store_bool")
        parser.add("--n_frames_for_encoder", default=8, type=int)
        augmentation.get_args(parser)
        return parser

    @staticmethod
    def get_dataloader(args, part, phase="train"):
        dirlist = voxceleb.get_part_data(args, part)
        loader = SegmSampleLoader(
            args.data_root, img_dir=args.img_dir, kp_dir=args.kp_dir,
            segm_dir=args.segm_dir, draw_oval=args.draw_oval,
            deterministic=part != "train")
        dataset = VoxCeleb2LandmarkDataset(
            dirlist, loader, bool(args.inference),
            args.n_frames_for_encoder, args.image_size, augmenter=None,
            load_segmentation=True)
        return BatchLoader(
            dataset, batch_size=args.batch_size, shuffle=phase == "train",
            seed=args.random_seed, num_workers=args.num_workers,
            prefetch_size=args.prefetch_size, drop_last=phase == "train")


class SegmSampleLoader(voxceleb.SampleLoader):
    """Base loader + pre-cropped segmentation masks."""

    def __init__(self, data_root, img_dir=None, kp_dir=None, segm_dir=None,
                 draw_oval=True, deterministic=False):
        super().__init__(data_root, img_dir, kp_dir, draw_oval=draw_oval,
                         deterministic=deterministic)
        self.segm_dir = segm_dir

    def load_sample(self, path, i, imsize, load_segmentation=False,
                    **kwargs):
        import cv2
        out = super().load_sample(path, i, imsize, **kwargs)
        if load_segmentation:
            base = Path(self.data_root) / self.segm_dir / path
            png = base / (i + ".png")
            npy = base / (i + ".png.npy")
            if png.exists():
                segm = cv2.imread(str(png))[:, :, 1]
            elif npy.exists():
                segm = np.load(str(npy))[:, :, 0]
            else:
                raise FileNotFoundError(f"Sample {png} not found")
            segm = cv2.resize(segm, (imsize, imsize))
            out["segmentation"] = (segm.astype(np.float32) / 255.0)[..., None]
        return out
