"""VoxCeleb2 data-source core: identity-list resolution, per-frame sample
loading, stickman rasterization, cross-driving sample lookup.

Behavioral parity with reference ``dataloaders/common/voxceleb.py``:
- 3-way data-source probe (``:39-81``): (1) data_root/img_dir/split_path is a
  directory -> that single identity; (2) split_path is a CSV file -> identity
  list from it; (3) list subdirectories of data_root/img_dir;
- fine-tune mode (``:83-99``): the list enumerates every image of the single
  identity; num_labels := 1;
- meta mode (``:101-115``): resume truncates to checkpoint num_labels; list
  padded to a multiple of world_size (here: jax.process_count());
- frame sampling ``list_ids`` (``:156-173``): deterministic (seed 666) or
  random sampling of k frames, cycling if the video is short;
- stickman: polylines of 8 face parts in fixed colors (``:128-152,260-266``);
- ``get_other_sample_by_label`` for cross-driving visuals (``:320-373``).
"""

from __future__ import annotations

import logging
import random
from pathlib import Path

import numpy as np

logger = logging.getLogger("latentpose_tpu.data.voxceleb")

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")


class Dirlist:
    """Identity (or image) list; index == label (pandas-index parity)."""

    def __init__(self, paths, files=None):
        self.paths = list(paths)
        self.files = list(files) if files is not None else None

    @property
    def finetuning(self):
        return self.files is not None

    def __len__(self):
        return len(self.paths)


def get_part_data(args, part) -> Dirlist:
    import jax
    assert part in ("train", "val")
    data_root = Path(args.data_root)
    img_dir = Path(args.img_dir)
    split_path = Path(args.train_split_path if part == "train"
                      else args.val_split_path)

    identity_list = None
    if (data_root / img_dir / split_path).is_dir():
        logger.info("[%s] single identity: %s", part, split_path)
        identity_list = [str(split_path)]
    elif split_path.is_file():
        logger.info("[%s] identity list from CSV %s", part, split_path)
        import pandas
        identity_list = list(pandas.read_csv(split_path)["path"])
    elif (data_root / img_dir).is_dir():
        # NOTE: the reference stores paths relative to data_root here
        # (voxceleb.py:58-66), which double-counts img_dir on load — a latent
        # bug it never hits because real runs use the CSV source.  We store
        # img_dir-relative paths, and descend identity/video when the tree is
        # two levels deep (the preprocessed layout).
        base = data_root / img_dir
        entries = sorted(x for x in base.iterdir() if x.is_dir())
        identity_list = []
        for entry in entries:
            subdirs = sorted(x for x in entry.iterdir() if x.is_dir())
            if subdirs:
                identity_list += [str(x.relative_to(base)) for x in subdirs]
            else:
                identity_list.append(str(entry.relative_to(base)))
        logger.info("[%s] %d sample dirs found under %s", part,
                    len(identity_list), base)
    else:
        raise ValueError(
            f"Could not determine input data source; check --data_root, "
            f"--img_dir and --{part}_split_path")

    if args.finetune:
        if len(identity_list) > 1:
            raise NotImplementedError(
                "fine-tuning to multiple identities is not available")
        images = sorted(
            p for ident in identity_list
            for p in (data_root / img_dir / ident).iterdir()
            if p.suffix.lower() in IMAGE_EXTENSIONS)
        logger.info("[%s] fine-tune dataset: %d images", part, len(images))
        args.num_labels = 1
        return Dirlist(
            paths=[str(p.parent.relative_to(data_root / img_dir))
                   for p in images],
            files=[p.stem for p in images])

    if args.checkpoint_path:
        logger.info("Truncating identity list to checkpoint num_labels=%d",
                    args.num_labels)
        identity_list = identity_list[:args.num_labels]
    elif part == "train":
        args.num_labels = len(identity_list)

    # pad to a multiple of the host count so per-host shards stay in lockstep
    world = jax.process_count()
    short = (world - len(identity_list) % world) % world
    identity_list = identity_list + identity_list[:short]
    return Dirlist(identity_list)


# stickman face parts: (keypoint ranges, closed?, RGB color)
STICKMAN_PARTS = [
    (list(range(17, 22)), False, (255, 0, 0)),
    (list(range(22, 27)), False, (0, 255, 0)),
    (list(range(27, 31)), False, (0, 0, 255)),
    (list(range(31, 36)), False, (0, 0, 255)),
    (list(range(36, 42)), True, (255, 0, 255)),
    (list(range(42, 48)), True, (0, 255, 255)),
    (list(range(48, 60)), True, (255, 255, 0)),
]
STICKMAN_OVAL = (list(range(0, 17)), False, (255, 255, 255))


class SampleLoader:
    """Loads individual frames (image / keypoints / stickman) from the
    preprocessed VoxCeleb2 tree."""

    def __init__(self, data_root, img_dir=None, kp_dir=None, draw_oval=True,
                 deterministic=False):
        self.data_root = Path(data_root)
        self.img_dir = img_dir
        self.kp_dir = kp_dir
        self.parts = ([STICKMAN_OVAL] if draw_oval else []) + STICKMAN_PARTS
        self.deterministic = deterministic

    def list_ids(self, path, k):
        """Sample k frame stems from a video directory."""
        full_path = self.data_root / self.img_dir / path
        # reference voxceleb.py:156-173, with one deliberate deviation: the
        # reference iterates the directory in OS order; we sort so the seeded
        # deterministic sample is stable across filesystems.  The oversample
        # growth (append the listing once per round, not doubling) matches
        # the reference exactly so the seeded draws agree.
        base = sorted(full_path.iterdir())
        id_list = list(base)
        rng = random.Random(666) if self.deterministic else random
        while k > len(id_list):
            id_list += base
        return [p.stem for p in rng.sample(id_list, k=k)]

    def load_rgb(self, path, i):
        import cv2
        img_path = self.data_root / self.img_dir / path / (i + ".jpg")
        if not img_path.exists():
            for ext in IMAGE_EXTENSIONS:
                alt = img_path.with_suffix(ext)
                if alt.exists():
                    img_path = alt
                    break
        image = cv2.imread(str(img_path))
        if image is None:
            logger.error("Couldn't load image %s", img_path)
            return np.zeros((1, 1, 3), np.uint8)
        return cv2.cvtColor(image, cv2.COLOR_BGR2RGB)

    def load_keypoints(self, path, i):
        kp_path = self.data_root / self.kp_dir / path / (i + ".npy")
        return np.load(kp_path)[:, :2]

    def draw_stickman(self, image_shape, keypoints):
        import cv2
        stickman = np.zeros(tuple(image_shape) + (3,), np.uint8)
        for edges, closed, color in self.parts:
            pts = np.round(keypoints[edges]).astype(np.int32)
            cv2.polylines(stickman, [pts], closed, color, thickness=2)
        return stickman

    def load_sample(self, path, i, imsize, load_image=False,
                    load_stickman=False, load_keypoints=False):
        """Base (pre-cropped) sample loading — images resized to imsize,
        keypoints normalized to [0, 1].  Returns float32 HWC arrays."""
        import cv2
        out = {}
        if load_image:
            image = self.load_rgb(path, i)
            ratio = imsize / image.shape[1]
            interp = cv2.INTER_CUBIC if ratio > 1.0 else cv2.INTER_AREA
            image_r = cv2.resize(image, (imsize, imsize),
                                 interpolation=interp)
            out["image"] = image_r.astype(np.float32) / 255.0
        if load_keypoints or load_stickman:
            assert load_image
            keypoints = self.load_keypoints(path, i) * ratio
            if load_stickman:
                stickman = self.draw_stickman((imsize, imsize), keypoints)
                out["stickman"] = stickman.astype(np.float32) / 255.0
            if load_keypoints:
                out["keypoints"] = (keypoints.astype(np.float32).flatten()
                                    / imsize)
        return out


class VoxCeleb2DatasetBase:
    """Index-based dataset over a Dirlist (torch-free)."""

    def __init__(self, dirlist: Dirlist, loader: SampleLoader, inference,
                 n_frames_for_encoder, imsize, augmenter):
        self.dirlist = dirlist
        self.loader = loader
        self.inference = inference
        self.n_frames_for_encoder = n_frames_for_encoder
        self.imsize = imsize
        self.augmenter = augmenter

        # person-id (first 7 chars of path) -> list of labels, for
        # cross-driving visuals (reference :320-373)
        self.identity_to_labels = {}
        for label, path in enumerate(self.dirlist.paths):
            self.identity_to_labels.setdefault(path[:7], []).append(label)

    def __len__(self):
        return len(self.dirlist)

    def get_other_sample_by_label(self, label, same_identity=False,
                                  deterministic=True):
        identity = self.dirlist.paths[label][:7]
        labels_here = self.identity_to_labels[identity]
        if same_identity:
            idx = 0
            while True:
                if deterministic:
                    other = labels_here[idx % len(labels_here)]
                    idx += 1
                else:
                    other = random.choice(labels_here)
                if other != label or len(labels_here) == 1:
                    return other
        else:
            other = labels_here[0]
            while True:
                if deterministic:
                    other = (other + 1) % len(self)
                else:
                    other = random.randint(0, len(self) - 1)
                if (self.dirlist.paths[other][:7] != identity
                        or len(labels_here) == len(self)):
                    return other

    def deterministic_(self, seed=0):
        return self.augmenter.deterministic_(seed)
