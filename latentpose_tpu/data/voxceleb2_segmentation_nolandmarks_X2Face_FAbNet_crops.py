"""Flagship pipeline with VoxCeleb1-style pose crops (reference
``dataloaders/voxceleb2_segmentation_nolandmarks_X2Face_FAbNet_crops.py``):
identity frames + targets come through the flagship bbox pipeline, but
``pose_input_rgbs`` uses the X2Face/FAb-Net crop — for the
pretrained-pose-encoder ablations (``:333-397``)."""

from __future__ import annotations

import numpy as np

from latentpose_tpu.data import augmentation
from latentpose_tpu.data.common import crop as crop_lib
from latentpose_tpu.data.common import voxceleb
from latentpose_tpu.data.pipeline import BatchLoader
from latentpose_tpu.data.voxceleb2_segmentation_nolandmarks import \
    SegmSampleLoader
from latentpose_tpu.data.voxceleb2_X2Face import voxceleb1_bbox


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--draw_oval", default=True, action="store_bool")
        parser.add("--n_frames_for_encoder", default=8, type=int)
        parser.add("--voxceleb1_crop_type", default="x2face",
                   help="x2face|fabnet")
        augmentation.get_args(parser)
        return parser

    @staticmethod
    def get_dataloader(args, part, phase="train"):
        dirlist = voxceleb.get_part_data(args, part)
        loader = MixedCropSampleLoader(
            args.data_root, img_dir=args.img_dir, kp_dir=args.kp_dir,
            segm_dir=args.segm_dir, bboxes_dir=args.bboxes_dir,
            draw_oval=args.draw_oval, deterministic=part != "train")
        loader.crop_type = getattr(args, "voxceleb1_crop_type", "x2face")
        dataset = MixedCropDataset(
            dirlist, loader, bool(args.inference),
            args.n_frames_for_encoder, args.image_size, augmenter=None)
        return BatchLoader(
            dataset, batch_size=args.batch_size, shuffle=phase == "train",
            seed=args.random_seed, num_workers=args.num_workers,
            prefetch_size=args.prefetch_size, drop_last=phase == "train")


class MixedCropSampleLoader(SegmSampleLoader):
    crop_type = "x2face"

    def load_voxceleb1_crop(self, path, i, imsize):
        import cv2
        image = self.load_rgb(path, i)
        raw = None
        try:
            identity, sequence = str(path).split("/")[-2:]
            raw = self.bboxes[identity][sequence][int(i)]
        except (KeyError, ValueError, IndexError):
            pass
        l, t, r, b = voxceleb1_bbox(raw, self.crop_type)
        ti, li, bi, ri = crop_lib.bbox_to_integer_coords(
            t, l, b, r, *image.shape[:2])
        cropped = crop_lib.crop_with_padding(image, ti, li, bi, ri)
        cropped = cv2.resize(cropped, (imsize, imsize))
        return cropped.astype(np.float32) / 255.0


class MixedCropDataset(voxceleb.VoxCeleb2DatasetBase):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.num_labels = 1 if self.dirlist.finetuning else len(self.dirlist)

    def __getitem__(self, index):
        data_dict, target_dict = {}, {}
        path = self.dirlist.paths[index]

        if self.dirlist.finetuning:
            frame = self.dirlist.files[index]
            s = self.loader.load_sample(
                path, frame, self.imsize, load_image=True,
                load_segmentation=not self.inference)
            data_dict["enc_rgbs"] = s["image"][None]
            data_dict["pose_input_rgbs"] = self.loader.load_voxceleb1_crop(
                path, frame, self.imsize)[None]
            if not self.inference:
                segm = s["segmentation"][None]
                data_dict["target_rgbs"] = s["image"][None] * segm
                target_dict["real_segm"] = segm
            target_dict["label"] = 0
        else:
            ids = self.loader.list_ids(path, self.n_frames_for_encoder + 1)
            enc = np.stack([
                self.loader.load_sample(path, i, self.imsize,
                                        load_image=True)["image"]
                for i in ids[:-1]])
            dec = self.loader.load_sample(
                path, ids[-1], self.imsize, load_image=True,
                load_segmentation=not self.inference)
            data_dict["enc_rgbs"] = enc
            data_dict["pose_input_rgbs"] = self.loader.load_voxceleb1_crop(
                path, ids[-1], self.imsize)[None]
            if not self.inference:
                segm = dec["segmentation"][None]
                data_dict["target_rgbs"] = dec["image"][None] * segm
                target_dict["real_segm"] = segm
            target_dict["label"] = index
        return data_dict, target_dict
