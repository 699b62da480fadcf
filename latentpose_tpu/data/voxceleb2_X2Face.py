"""X2Face-crop dataset (reference ``dataloaders/voxceleb2_X2Face.py``): the
landmark dataset where pose input AND target use a VoxCeleb1-style crop
(square bbox x1.4; for FAb-Net additionally the fixed 43/66/43/20-pixel
cutoffs of a 256 crop — reference ``:257-297``)."""

from __future__ import annotations

import logging

import numpy as np

from latentpose_tpu.data import augmentation
from latentpose_tpu.data.common import crop as crop_lib
from latentpose_tpu.data.common import voxceleb
from latentpose_tpu.data.pipeline import BatchLoader

logger = logging.getLogger("latentpose_tpu.data.voxceleb2_x2face")

VOXCELEB1_SCALE = 1.4
FABNET_CUTOFFS = (43 / 256, 66 / 256, 43 / 256, 20 / 256)  # l, t, r, b


def voxceleb1_bbox(raw_bbox_256, crop_type="x2face"):
    """Squared + x1.4 bbox in [0,1] space; FAb-Net cutoffs optionally."""
    if raw_bbox_256 is None:
        cutoff = (1 - VOXCELEB1_SCALE / 1.8) / 2
        l, t, r, b = cutoff, cutoff, 1 - cutoff, 1 - cutoff
    else:
        l, t, r, b = (np.asarray(raw_bbox_256, np.float64) / 256.0).tolist()
        l, t, r, b = crop_lib.square_and_scale_bbox(l, t, r, b,
                                                    scale=VOXCELEB1_SCALE)
    if crop_type == "fabnet":
        cl, ct, cr, cb = FABNET_CUTOFFS
        w, h = r - l, b - t
        l, r = l + w * cl, r - w * cr
        t, b = t + h * ct, b - h * cb
    return l, t, r, b


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
        loader = X2FaceSampleLoader(
            args.data_root, img_dir=args.img_dir, kp_dir=args.kp_dir,
            bboxes_dir=args.bboxes_dir, draw_oval=args.draw_oval,
            crop_type=getattr(args, "voxceleb1_crop_type", "x2face"),
            deterministic=part != "train")
        dataset = X2FaceDataset(
            dirlist, loader, bool(args.inference),
            args.n_frames_for_encoder, args.image_size, augmenter=None)
        return BatchLoader(
            dataset, batch_size=args.batch_size, shuffle=phase == "train",
            seed=args.random_seed, num_workers=args.num_workers,
            prefetch_size=args.prefetch_size, drop_last=phase == "train")


class X2FaceSampleLoader(voxceleb.SampleLoader):
    def __init__(self, data_root, img_dir=None, kp_dir=None, bboxes_dir=None,
                 draw_oval=True, crop_type="x2face", deterministic=False):
        super().__init__(data_root, img_dir, kp_dir, draw_oval=draw_oval,
                         deterministic=deterministic)
        self.crop_type = crop_type
        try:
            self.bboxes = np.load(str(bboxes_dir), allow_pickle=True).item()
        except (FileNotFoundError, OSError):
            self.bboxes = {}
            logger.warning("No bboxes .npy at %r; assuming pre-cropped",
                           str(bboxes_dir))

    def load_sample(self, path, i, imsize, load_image=False,
                    load_voxceleb1_crop=False, **_):
        import cv2
        out = {}
        if not load_image and not load_voxceleb1_crop:
            return out
        image = self.load_rgb(path, i)

        if load_image:
            interp = cv2.INTER_CUBIC if imsize > image.shape[0] \
                else cv2.INTER_AREA
            out["image"] = cv2.resize(
                image, (imsize, imsize),
                interpolation=interp).astype(np.float32) / 255.0

        if load_voxceleb1_crop:
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
            out["image_cropped_voxceleb1"] = \
                cropped.astype(np.float32) / 255.0
        return out


class X2FaceDataset(voxceleb.VoxCeleb2DatasetBase):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.num_labels = 1 if self.dirlist.finetuning else len(self.dirlist)

    def __getitem__(self, index):
        data_dict, target_dict = {}, {}
        path = self.dirlist.paths[index]
        if self.dirlist.finetuning:
            frame = self.dirlist.files[index]
            s = self.loader.load_sample(path, frame, self.imsize,
                                        load_image=True,
                                        load_voxceleb1_crop=True)
            data_dict["enc_rgbs"] = s["image"][None]
            data_dict["pose_input_rgbs"] = \
                s["image_cropped_voxceleb1"][None]
            data_dict["target_rgbs"] = s["image_cropped_voxceleb1"][None]
            target_dict["label"] = 0
        else:
            ids = self.loader.list_ids(path, self.n_frames_for_encoder + 1)
            encs = [self.loader.load_sample(path, i, self.imsize,
                                            load_image=True)
                    for i in ids[:-1]]
            dec = self.loader.load_sample(path, ids[-1], self.imsize,
                                          load_image=True,
                                          load_voxceleb1_crop=True)
            data_dict["enc_rgbs"] = np.stack([e["image"] for e in encs])
            data_dict["pose_input_rgbs"] = \
                dec["image_cropped_voxceleb1"][None]
            data_dict["target_rgbs"] = dec["image_cropped_voxceleb1"][None]
            target_dict["label"] = index
        return data_dict, target_dict
