"""FSTH small-crop dataset (reference ``dataloaders/voxceleb2_FSTH_crop.py``):
the landmark dataset with a fixed centered crop cutting 20% off the top
(``:38-47``), matching the few-shot-talking-heads training crop."""

from __future__ import annotations

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
        loader = FSTHCropSampleLoader(
            args.data_root, img_dir=args.img_dir, kp_dir=args.kp_dir,
            draw_oval=args.draw_oval, deterministic=part != "train")
        dataset = VoxCeleb2LandmarkDataset(
            dirlist, loader, bool(args.inference),
            args.n_frames_for_encoder, args.image_size, augmenter=None,
            load_segmentation=False)
        return BatchLoader(
            dataset, batch_size=args.batch_size, shuffle=phase == "train",
            seed=args.random_seed, num_workers=args.num_workers,
            prefetch_size=args.prefetch_size, drop_last=phase == "train")


class FSTHCropSampleLoader(voxceleb.SampleLoader):
    """Fixed crop: cut 20% from the top, center the square horizontally."""

    def load_sample(self, path, i, imsize, load_image=False,
                    load_stickman=False, load_keypoints=False, **_):
        import cv2
        out = {}
        if not load_image:
            return out
        image = self.load_rgb(path, i)
        cut_t, cut_b = 0.2, 1.0
        cut_l = (1.0 - (cut_b - cut_t)) / 2
        cut_r = 1.0 - cut_l
        t = min(image.shape[0] - 1, round(cut_t * image.shape[0]))
        l = min(image.shape[1] - 1, round(cut_l * image.shape[1]))
        b = max(t + 1, round(cut_b * image.shape[0]))
        r = max(l + 1, round(cut_r * image.shape[1]))
        image = image[t:b, l:r]

        if load_keypoints or load_stickman:
            kp = self.load_keypoints(path, i).astype(np.float32)
            kp -= [[l, t]]
            kp *= [[imsize / (r - l), imsize / (b - t)]]

        interp = cv2.INTER_CUBIC if imsize > image.shape[0] \
            else cv2.INTER_AREA
        image = cv2.resize(image, (imsize, imsize), interpolation=interp)
        out["image"] = image.astype(np.float32) / 255.0
        if load_stickman:
            out["stickman"] = self.draw_stickman(
                (imsize, imsize), kp).astype(np.float32) / 255.0
        if load_keypoints:
            out["keypoints"] = kp.flatten() / imsize
        return out
