"""Flagship dataset: VoxCeleb2 + segmentation, no landmarks (latent pose).

Behavioral parity with reference
``dataloaders/voxceleb2_segmentation_nolandmarks.py``:
- per sample = one video: sample K+1 frames -> K ``enc_rgbs`` + 1 driver
  (``:211-241``);
- bbox from the precomputed per-(identity, sequence, frame) ``.npy`` dict,
  squared, x1.8 (``:98-112``); missing file -> assume pre-cropped;
- VoxCeleb2.1 gray-border strip ([1:-1, 1:-1]) before cropping;
- crop with blur-faded reflection padding (common/crop.py);
- segmentation from PNG channel 1 or ``.npy`` (``:70-87``);
- target = image * segmentation (``:237``);
- fine-tune branch: a single image serves as identity + driver + target
  (``:187-209``);
- augmentation of the (driver, target, segm) triplet — ours runs *on device*
  inside the train step (data/augmentation.py), so the host loader only
  decodes/crops.

Keys emitted (NHWC): enc_rgbs (K, H, W, 3), pose_input_rgbs (1, H, W, 3),
target_rgbs (1, H, W, 3), real_segm (1, H, W, 1), label ().
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from latentpose_tpu.data import augmentation
from latentpose_tpu.data.common import crop as crop_lib
from latentpose_tpu.data.common import voxceleb
from latentpose_tpu.data.pipeline import BatchLoader

logger = logging.getLogger("latentpose_tpu.data.voxceleb2_segm_nolm")


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
            segm_dir=args.segm_dir, bboxes_dir=args.bboxes_dir,
            draw_oval=args.draw_oval, deterministic=part != "train",
            # --transfer_dtype uint8: emit the wire format straight from
            # the decode path (native loader quantizes on its threads) —
            # no per-batch f32->u8 pass; the step dequantizes on device
            wire_dtype=getattr(args, "transfer_dtype", "float32"))
        dataset = VoxCeleb2SegmDataset(
            dirlist, loader, bool(args.inference),
            args.n_frames_for_encoder, args.image_size, augmenter=None)
        return BatchLoader(
            dataset, batch_size=args.batch_size,
            shuffle=phase == "train", seed=args.random_seed,
            num_workers=args.num_workers, prefetch_size=args.prefetch_size,
            drop_last=phase == "train")


class SegmSampleLoader(voxceleb.SampleLoader):
    """Adds bbox-crop + segmentation to the base frame loader."""

    def __init__(self, data_root, img_dir=None, kp_dir=None, segm_dir=None,
                 bboxes_dir=None, draw_oval=True, deterministic=False,
                 wire_dtype="float32"):
        super().__init__(data_root, img_dir, kp_dir, draw_oval=draw_oval,
                         deterministic=deterministic)
        self.segm_dir = segm_dir
        # 'uint8': images/segm stay uint8 end-to-end (the JPEG decode is
        # uint8 anyway); values equal quantize_batch_u8 of the f32 path
        self.wire_dtype = wire_dtype
        try:
            self.bboxes = np.load(str(bboxes_dir), allow_pickle=True).item()
        except (FileNotFoundError, OSError):
            self.bboxes = {}
            logger.warning("No bboxes .npy found at %r; assuming images are "
                           "already cropped", str(bboxes_dir))

    def _bbox_for(self, path, i):
        """[0,1]-space (l, t, r, b), squared and x1.8-scaled; identity bbox
        if unknown (pre-cropped images)."""
        try:
            identity, sequence = str(path).split("/")[-2:]
            raw = self.bboxes[identity][sequence][int(i)]
            l, t, r, b = (raw / 256.0).tolist()
        except (KeyError, ValueError, IndexError):
            return 0.0, 0.0, 1.0, 1.0, False
        l, t, r, b = crop_lib.square_and_scale_bbox(l, t, r, b)
        return l, t, r, b, True

    def _resolve_image(self, path, i):
        img_path = Path(self.data_root) / self.img_dir / path / (i + ".jpg")
        if not img_path.exists():
            for ext in voxceleb.IMAGE_EXTENSIONS:
                alt = img_path.with_suffix(ext)
                if alt.exists():
                    return alt
        return img_path

    def load_images(self, path, ids, imsize):
        """Batched decode + padded crop + resize for several frames of one
        sequence.  Fast path: the native C++ pool (decode, blur-fade padded
        crop, AREA/CUBIC resize — parity-tested vs the python path in
        tests/test_native_cropped_loader.py); falls back to per-frame
        load_sample when the library is unavailable."""
        from latentpose_tpu.data import native_loader
        if not native_loader.is_available():
            return [self.load_sample(path, i, imsize,
                                     load_image=True)["image"] for i in ids]
        if getattr(self, "_native", None) is None:
            self._native = native_loader.NativeBatchLoader()
        paths, bboxes, flags = [], [], []
        for i in ids:
            l, t, r, b, has_bbox = self._bbox_for(path, i)
            paths.append(self._resolve_image(path, i))
            bboxes.append((l, t, r, b))
            flags.append(has_bbox)
        load = (self._native.load_cropped_u8
                if self.wire_dtype == "uint8"
                else self._native.load_cropped)
        images, failed = load(
            paths, np.asarray(bboxes, np.float64),
            np.asarray(flags, np.uint8), imsize)
        if failed:
            # zeros fallback matches the python path's missing-image
            # behavior (voxceleb.py load_rgb -> zeros)
            logger.error("%d/%d frames failed to load under %s",
                         failed, len(ids), path)
        return list(images)

    def load_segm(self, path, i):
        import cv2
        base = Path(self.data_root) / self.segm_dir / path
        png = base / (i + ".png")
        npy = base / (i + ".png.npy")
        if png.exists():
            # channel 1: PGN head+body; Graphonomy channels identical
            segm = cv2.imread(str(png))
            if segm is None:
                logger.critical("Couldn't load segmentation %s", png)
                return np.ones((1, 1), np.uint8)
            return segm[:, :, 1]
        if npy.exists():
            return np.load(str(npy))[:, :, 0]
        raise FileNotFoundError(f"Sample {png} not found")

    def load_sample(self, path, i, imsize, load_image=False,
                    load_stickman=False, load_keypoints=False,
                    load_segmentation=False):
        import cv2
        out = {}
        l, t, r, b, has_bbox = self._bbox_for(path, i)

        if load_image:
            image = self.load_rgb(path, i)
            ti, li, bi, ri = crop_lib.bbox_to_integer_coords(
                t, l, b, r, *image.shape[:2])
            if has_bbox:
                # VoxCeleb2.1 gray-border strip
                image = image[1:-1, 1:-1]
                ti, li, bi, ri = ti - 1, li - 1, bi - 1, ri - 1
            image = crop_lib.crop_with_padding(image, ti, li, bi, ri)
            interp = (cv2.INTER_CUBIC if imsize > bi - ti
                      else cv2.INTER_AREA)
            image = cv2.resize(image, (imsize, imsize), interpolation=interp)
            # cv2 resizes u8->u8, so the u8 wire is the SAME bytes the f32
            # path divides by 255 (bit-equal to quantize_batch_u8 of it)
            out["image"] = image if self.wire_dtype == "uint8" \
                else image.astype(np.float32) / 255.0

        if load_keypoints or load_stickman:
            assert load_image
            kp = self.load_keypoints(path, i).astype(np.float32)
            kp /= image.shape[1]
            kp -= [[l, t]]
            kp /= [[r - l, b - t]]
            if load_stickman:
                raster = self.draw_stickman((imsize, imsize), kp * imsize)
                out["stickman"] = raster if self.wire_dtype == "uint8" \
                    else raster.astype(np.float32) / 255.0
            if load_keypoints:
                out["keypoints"] = kp.flatten()

        if load_segmentation:
            segm = self.load_segm(path, i)
            ti, li, bi, ri = crop_lib.bbox_to_integer_coords(
                t, l, b, r, *segm.shape[:2])
            if has_bbox:
                segm = segm[1:-1, 1:-1]
                ti, li, bi, ri = ti - 1, li - 1, bi - 1, ri - 1
            segm = crop_lib.crop_with_padding(segm, ti, li, bi, ri,
                                              segmentation=True)
            segm = cv2.resize(segm, (imsize, imsize))
            out["segmentation"] = segm[..., None] \
                if self.wire_dtype == "uint8" \
                else (segm.astype(np.float32) / 255.0)[..., None]

        return out


class VoxCeleb2SegmDataset(voxceleb.VoxCeleb2DatasetBase):
    def __init__(self, dirlist, loader, inference, n_frames_for_encoder,
                 imsize, augmenter=None):
        super().__init__(dirlist, loader, inference, n_frames_for_encoder,
                         imsize, augmenter)
        self.num_labels = 1 if dirlist.finetuning else len(dirlist)

    @staticmethod
    def _masked_target(image, segm):
        """target = image * segmentation (reference ``:237``), in the wire
        dtype: uint8 inputs produce floor(i*s/255 + 0.5) — exactly the
        wire quantization of the f32 product (i/255)*(s/255)."""
        if image.dtype == np.uint8:
            return np.floor(
                image.astype(np.float32) * segm.astype(np.float32)
                / 255.0 + 0.5).astype(np.uint8)
        return image * segm

    def __getitem__(self, index):
        data_dict, target_dict = {}, {}
        path = self.dirlist.paths[index]

        if self.dirlist.finetuning:
            frame = self.dirlist.files[index]
            sample = self.loader.load_sample(
                path, frame, self.imsize, load_image=True,
                load_segmentation=not self.inference)
            image = sample["image"][None]  # (1, H, W, 3)
            data_dict["enc_rgbs"] = image
            data_dict["pose_input_rgbs"] = image
            if not self.inference:
                segm = sample["segmentation"][None]
                data_dict["target_rgbs"] = self._masked_target(image, segm)
                target_dict["real_segm"] = segm
            target_dict["label"] = 0
        else:
            ids = self.loader.list_ids(path, self.n_frames_for_encoder + 1)
            enc_ids, dec_id = ids[:-1], ids[-1]

            enc = np.stack(
                self.loader.load_images(path, enc_ids, self.imsize))
            data_dict["enc_rgbs"] = enc

            dec = self.loader.load_sample(
                path, dec_id, self.imsize, load_image=True,
                load_segmentation=not self.inference)
            data_dict["pose_input_rgbs"] = dec["image"][None]
            if not self.inference:
                segm = dec["segmentation"][None]
                data_dict["target_rgbs"] = self._masked_target(
                    dec["image"][None], segm)
                target_dict["real_segm"] = segm
            target_dict["label"] = index

        return data_dict, target_dict
