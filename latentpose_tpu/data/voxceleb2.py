"""Landmark dataset (Zakharov/FSTH reproduction) — parity with reference
``dataloaders/voxceleb2.py``: images + stickmen + keypoints, no segmentation,
no bbox crop (images assumed pre-cropped).

Keys: enc_rgbs, enc_stickmen (B, K, H, W, 3); pose_input_rgbs, target_rgbs,
dec_stickmen (B, 1, H, W, 3); dec_keypoints (B, 1, 136); label.
"""

from __future__ import annotations

import numpy as np

from latentpose_tpu.data import augmentation
from latentpose_tpu.data.common import voxceleb
from latentpose_tpu.data.pipeline import BatchLoader


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
        loader = voxceleb.SampleLoader(
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


class VoxCeleb2LandmarkDataset(voxceleb.VoxCeleb2DatasetBase):
    def __init__(self, dirlist, loader, inference, n_frames_for_encoder,
                 imsize, augmenter=None, load_segmentation=False):
        super().__init__(dirlist, loader, inference, n_frames_for_encoder,
                         imsize, augmenter)
        self.load_segmentation = load_segmentation
        self.num_labels = 1 if dirlist.finetuning else len(dirlist)

    def _load(self, path, frame, segm=False):
        kwargs = dict(load_image=True, load_stickman=True,
                      load_keypoints=True)
        if segm:
            kwargs["load_segmentation"] = True
        return self.loader.load_sample(path, frame, self.imsize, **kwargs)

    def __getitem__(self, index):
        data_dict, target_dict = {}, {}
        path = self.dirlist.paths[index]
        want_segm = self.load_segmentation and not self.inference

        if self.dirlist.finetuning:
            dec = self._load(path, self.dirlist.files[index], want_segm)
            image = dec["image"][None]
            stickman = dec["stickman"][None]
            data_dict["enc_rgbs"] = image
            data_dict["enc_stickmen"] = stickman
            data_dict["pose_input_rgbs"] = image
            data_dict["dec_stickmen"] = stickman
            data_dict["dec_keypoints"] = dec["keypoints"][None]
            if not self.inference:
                if want_segm:
                    segm = dec["segmentation"][None]
                    data_dict["target_rgbs"] = image * segm
                    target_dict["real_segm"] = segm
                else:
                    data_dict["target_rgbs"] = image
            target_dict["label"] = 0
        else:
            ids = self.loader.list_ids(path, self.n_frames_for_encoder + 1)
            encs = [self._load(path, i) for i in ids[:-1]]
            dec = self._load(path, ids[-1], want_segm)

            data_dict["enc_rgbs"] = np.stack([e["image"] for e in encs])
            data_dict["enc_stickmen"] = np.stack(
                [e["stickman"] for e in encs])
            data_dict["pose_input_rgbs"] = dec["image"][None]
            data_dict["dec_stickmen"] = dec["stickman"][None]
            data_dict["dec_keypoints"] = dec["keypoints"][None]
            if not self.inference:
                if want_segm:
                    segm = dec["segmentation"][None]
                    data_dict["target_rgbs"] = dec["image"][None] * segm
                    target_dict["real_segm"] = segm
                else:
                    data_dict["target_rgbs"] = dec["image"][None]
            target_dict["label"] = index

        return data_dict, target_dict
