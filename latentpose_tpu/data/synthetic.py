"""Synthetic procedural "talking head" dataset — the hermetic fixture.

The reference has no tests (SURVEY.md §4); this dataset exists so that every
pipeline stage (meta-train, fine-tune, drive, eval) runs end-to-end with zero
external data.  Each (identity, video, frame) deterministically renders a
face-like image: an elliptical head whose color/size encode identity and
whose "gaze"/head offset encode pose; the matching segmentation mask is the
head ellipse.  Pose varies smoothly with frame index so driving sequences are
meaningful.

Emits the flagship data contract (SURVEY.md §2.3,
``dataloaders/voxceleb2_segmentation_nolandmarks.py``):
  data_dict:   enc_rgbs (B, K, H, W, 3), pose_input_rgbs (B, 1, H, W, 3)
  target_dict: target_rgbs (B, 1, H, W, 3) = image * segm,
               real_segm (B, 1, H, W, 1), label (B,)
"""

from __future__ import annotations

import numpy as np

from latentpose_tpu.data import augmentation


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--num_enc_frames", type=int, default=8,
                   help="K identity frames per sample (reference samples "
                        "9 frames: 8 enc + 1 driver)")
        parser.add("--synthetic_num_labels", type=int, default=16)
        parser.add("--synthetic_frames_per_video", type=int, default=32)
        # emit enc_stickmen/dec_stickmen/dec_keypoints so the FSTH /
        # FSTH_plus / no_pose families run hermetically through the CLI
        parser.add("--synthetic_stickmen", action="store_bool",
                   default=False)
        # augmentation runs inside the jitted step (runners/holycow.py), so
        # the synthetic loader supports the same flags as the VoxCeleb ones
        # (needed to rehearse reference-parity meta-training hermetically)
        augmentation.get_args(parser)

    @staticmethod
    def get_dataloader(args, part, phase="train"):
        num_labels = getattr(args, "synthetic_num_labels", 16) or 16
        return SyntheticDataLoader(
            image_size=args.image_size,
            batch_size=args.batch_size,
            num_labels=num_labels,
            num_enc_frames=getattr(args, "num_enc_frames", 8),
            frames_per_video=getattr(args, "synthetic_frames_per_video", 32),
            finetune=bool(getattr(args, "finetune", False)),
            inference=bool(getattr(args, "inference", False)),
            seed=args.random_seed + (0 if part == "train" else 1),
            stickmen=bool(getattr(args, "synthetic_stickmen", False)),
            # --transfer_dtype uint8: emit the wire format straight from
            # the render cache; the step dequantizes on device
            wire_dtype=getattr(args, "transfer_dtype", "float32"),
        )


def _identity_style(label: int):
    rng = np.random.RandomState(1000 + label)
    skin = 0.35 + 0.55 * rng.rand(3)
    bg = 0.1 + 0.3 * rng.rand(3)
    size = 0.28 + 0.10 * rng.rand()
    eye_sep = 0.30 + 0.15 * rng.rand()
    return skin, bg, size, eye_sep


def _pose_of_frame(frame: int, period: int = 32):
    t = 2 * np.pi * (frame % period) / period
    yaw = 0.35 * np.sin(t)            # [-0.35, 0.35] horizontal shift
    pitch = 0.2 * np.sin(2 * t + 1.0)
    mouth = 0.5 + 0.5 * np.sin(3 * t)
    return yaw, pitch, mouth


# Rendered-frame cache: the pose trajectory has period 32, so a run touches
# at most num_labels x 32 distinct frames; at 256² a full 128-identity set is
# ~3.2 GB of f32 — cheap next to host RAM, and it turns the host-side render
# cost (~14 ms/frame at 256², i.e. ~1 s per 72-frame flagship batch) into a
# one-time warmup.  Cached arrays are exact (no quantization) and read-only.
import os as _os

_RENDER_CACHE_CAP = int(_os.environ.get("LPT_SYNTH_CACHE_MB", "8192")) << 20
_render_cache: dict = {}
_render_cache_bytes = 0


class _SlabPool:
    """Bump allocator over large ``np.zeros`` slabs.

    Retaining many small fresh mallocs forces the allocator to keep mapping
    new anonymous memory, and on this fleet's VMs first-touch write faults
    to plain-mmap'd pages run ~150 ms/MB (measured; calloc-backed pages
    fault ~300x faster).  Copying retained cache entries into zeros-backed
    slabs turns a multi-minute cache build into seconds.
    """

    def __init__(self, slab_bytes=256 << 20):
        self._slab = None
        self._off = 0
        self._slab_bytes = slab_bytes

    def store(self, arr):
        n = int(arr.nbytes)
        if self._slab is None or self._off + n > self._slab.nbytes:
            self._slab = np.zeros(max(self._slab_bytes, n), np.uint8)
            self._off = 0
        view = self._slab[self._off:self._off + n] \
            .view(arr.dtype).reshape(arr.shape)
        np.copyto(view, arr)
        self._off += (n + 63) & ~63  # keep 64-byte alignment
        view.flags.writeable = False
        return view


_slab_pool = _SlabPool()


def render_face(label: int, frame: int, image_size: int):
    """Render (image, segm) float32 in [0, 1]; (H, W, 3) and (H, W, 1).

    Results are cached (exact, read-only) keyed by (label, frame mod the
    pose period, image_size); callers must not mutate them in place.
    """
    global _render_cache_bytes
    key = (int(label), int(frame) % 32, int(image_size))
    hit = _render_cache.get(key)
    if hit is not None:
        return hit
    img, segm = _render_face_uncached(label, frame, image_size)
    nbytes = img.nbytes + segm.nbytes
    if _render_cache_bytes + nbytes <= _RENDER_CACHE_CAP:
        img = _slab_pool.store(img)
        segm = _slab_pool.store(segm)
        _render_cache[key] = (img, segm)
        _render_cache_bytes += nbytes
    return img, segm


def render_face_u8(label: int, frame: int, image_size: int):
    """uint8 twin of :func:`render_face` for the uint8 wire format:
    (img_u8, segm_u8 in {0,255}, target_u8 = img*segm pre-masked), each
    exactly ``quantize_batch_u8`` of the f32 render (x*255+0.5 floor), so
    the device-side /255 reproduces the f32 path to 8-bit rounding —
    without any per-batch f32->u8 conversion pass on the host.  Cached
    like the f32 renders."""
    global _render_cache_bytes
    key = ("u8", int(label), int(frame) % 32, int(image_size))
    hit = _render_cache.get(key)
    if hit is not None:
        return hit
    img, segm = render_face(label, frame, image_size)
    img_u8 = (img * 255.0 + 0.5).astype(np.uint8)
    segm_u8 = (segm * 255.0 + 0.5).astype(np.uint8)
    target_u8 = ((img * segm) * 255.0 + 0.5).astype(np.uint8)
    nbytes = img_u8.nbytes + segm_u8.nbytes + target_u8.nbytes
    if _render_cache_bytes + nbytes <= _RENDER_CACHE_CAP:
        img_u8 = _slab_pool.store(img_u8)
        segm_u8 = _slab_pool.store(segm_u8)
        target_u8 = _slab_pool.store(target_u8)
        _render_cache[key] = (img_u8, segm_u8, target_u8)
        _render_cache_bytes += nbytes
    return img_u8, segm_u8, target_u8


def render_stickman_u8(label: int, frame: int, image_size: int):
    """uint8 stickman (the raw cv2 raster — /255 moves on-device)."""
    global _render_cache_bytes
    key = ("stick_u8", int(label), int(frame) % 32, int(image_size))
    hit = _render_cache.get(key)
    if hit is not None:
        return hit
    out = (render_stickman(label, frame, image_size)
           * 255.0 + 0.5).astype(np.uint8)
    if _render_cache_bytes + out.nbytes <= _RENDER_CACHE_CAP:
        out = _slab_pool.store(out)
        _render_cache[key] = out
        _render_cache_bytes += out.nbytes
    return out


def _render_face_uncached(label: int, frame: int, image_size: int):
    skin, bg, size, eye_sep = _identity_style(label)
    yaw, pitch, mouth = _pose_of_frame(frame)
    h = w = image_size

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy = yy / h - 0.5
    xx = xx / w - 0.5

    cx = 0.5 * yaw * size
    cy = 0.5 * pitch * size
    # head ellipse
    d2 = ((xx - cx) / size) ** 2 + ((yy - cy) / (1.25 * size)) ** 2
    head = (d2 < 1.0).astype(np.float32)

    img = np.empty((h, w, 3), np.float32)
    img[:] = bg
    img = img * (1 - head[..., None]) + skin * head[..., None]

    # eyes: dark circles, horizontal position shifts with yaw (the "pose")
    for side in (-1, 1):
        ex = cx + side * eye_sep * size * 0.5 + 0.3 * yaw * size
        ey = cy - 0.35 * size + 0.2 * pitch * size
        e2 = ((xx - ex) / (0.12 * size)) ** 2 + ((yy - ey) / (0.12 * size)) ** 2
        eye = (e2 < 1.0).astype(np.float32)
        img = img * (1 - eye[..., None]) + 0.05 * eye[..., None]

    # mouth: dark ellipse whose openness encodes `mouth`
    mx, my = cx, cy + 0.55 * size
    m2 = ((xx - mx) / (0.3 * size)) ** 2 + \
         ((yy - my) / (0.05 * size + 0.12 * size * mouth)) ** 2
    mo = (m2 < 1.0).astype(np.float32)
    img = img * (1 - mo[..., None]) + 0.1 * mo[..., None]

    # the style scalars are float64 (rng.rand), so the math above upcasts;
    # cast once here — identical values to the downstream .astype(float32)
    # the loaders always applied, at half the cache/copy cost.
    return (img.astype(np.float32), np.ascontiguousarray(
        head[..., None], dtype=np.float32))


def synthetic_keypoints(label: int, frame: int, image_size: int):
    """68-point face landmarks (iBUG-68 layout) for the procedural face —
    derived from the same geometry as :func:`_render_face_uncached` (head
    ellipse, eyes, mouth), so keypoints/stickmen are consistent with the
    rendered pose.  Returns (68, 2) float32 pixel coordinates.

    Lets the FSTH / FSTH_plus / no_pose model families (which consume
    ``enc_stickmen`` / ``dec_stickmen`` / ``dec_keypoints``) run hermetically
    through the production CLI, like the flagship does."""
    _, _, size, eye_sep = _identity_style(label)
    yaw, pitch, mouth = _pose_of_frame(frame)
    cx = 0.5 * yaw * size
    cy = 0.5 * pitch * size
    pts = np.zeros((68, 2), np.float32)

    # jaw / face oval (0-16): lower half of the head ellipse, left->right
    a = np.linspace(0.95 * np.pi, 0.05 * np.pi, 17)
    pts[0:17, 0] = cx + size * np.cos(a)
    pts[0:17, 1] = cy + 1.25 * size * np.sin(a)

    eye_centers = {}
    for key, side in (("l", -1), ("r", 1)):
        ex = cx + side * eye_sep * size * 0.5 + 0.3 * yaw * size
        ey = cy - 0.35 * size + 0.2 * pitch * size
        eye_centers[key] = (ex, ey)

    # brows (17-21 left, 22-26 right): flat arcs above the eyes
    for start, key in ((17, "l"), (22, "r")):
        ex, ey = eye_centers[key]
        pts[start:start + 5, 0] = np.linspace(ex - 0.18 * size,
                                              ex + 0.18 * size, 5)
        pts[start:start + 5, 1] = ey - 0.22 * size

    # nose bridge (27-30) + base (31-35)
    pts[27:31, 0] = cx
    pts[27:31, 1] = np.linspace(cy - 0.2 * size, cy + 0.25 * size, 4)
    pts[31:36, 0] = cx + np.linspace(-0.12, 0.12, 5) * size
    pts[31:36, 1] = cy + 0.3 * size

    # eyes (36-41 left, 42-47 right): hexagons at the rendered eye circles
    for start, key in ((36, "l"), (42, "r")):
        ex, ey = eye_centers[key]
        ang = np.linspace(0, 2 * np.pi, 7)[:6]
        pts[start:start + 6, 0] = ex + 0.12 * size * np.cos(ang)
        pts[start:start + 6, 1] = ey + 0.12 * size * np.sin(ang)

    # mouth: outer ellipse (48-59) + inner (60-67); height tracks openness
    mw = 0.3 * size
    mh = 0.05 * size + 0.12 * size * mouth
    myc = cy + 0.55 * size
    ang = np.linspace(0, 2 * np.pi, 13)[:12]
    pts[48:60, 0] = cx + mw * np.cos(ang)
    pts[48:60, 1] = myc + mh * np.sin(ang)
    ang = np.linspace(0, 2 * np.pi, 9)[:8]
    pts[60:68, 0] = cx + 0.7 * mw * np.cos(ang)
    pts[60:68, 1] = myc + 0.7 * mh * np.sin(ang)

    return (pts + 0.5) * image_size  # grid coords [-0.5, 0.5] -> pixels


def render_stickman(label: int, frame: int, image_size: int):
    """Rasterize the synthetic landmarks through the SAME polyline renderer
    the VoxCeleb pipeline uses (data/common/voxceleb.py STICKMAN_PARTS), so
    hermetic FSTH runs exercise the production stickman code.  (H, W, 3)
    float32 in [0, 1], cached like the face renders."""
    global _render_cache_bytes
    key = ("stick", int(label), int(frame) % 32, int(image_size))
    hit = _render_cache.get(key)
    if hit is not None:
        return hit
    from latentpose_tpu.data.common.voxceleb import (STICKMAN_OVAL,
                                                     STICKMAN_PARTS)
    import cv2
    kp = synthetic_keypoints(label, frame, image_size)
    stickman = np.zeros((image_size, image_size, 3), np.uint8)
    for edges, closed, color in [STICKMAN_OVAL] + STICKMAN_PARTS:
        pts = np.round(kp[edges]).astype(np.int32)
        cv2.polylines(stickman, [pts], closed, color, thickness=2)
    out = stickman.astype(np.float32) / 255.0
    if _render_cache_bytes + out.nbytes <= _RENDER_CACHE_CAP:
        out = _slab_pool.store(out)
        _render_cache[key] = out
        _render_cache_bytes += out.nbytes
    return out


class _SyntheticSampleLoader:
    """Minimal ``SampleLoader`` stand-in so the fixed-probe path
    (``runners/loop.py:run_fixed_id_eval``) can toggle deterministic frame
    sampling exactly as it does for the VoxCeleb datasets."""

    def __init__(self):
        self.deterministic = False


class SyntheticDataset:
    """Index-based view over the synthetic identities, implementing the
    dataset surface the epoch loop's visual/probe machinery uses
    (``VoxCeleb2DatasetBase`` parity): ``__getitem__`` -> single-sample
    (data_dict, target_dict), ``get_other_sample_by_label`` for
    cross-driving grids (reference ``holycow.py:266-342``)."""

    def __init__(self, image_size, num_labels, num_enc_frames,
                 frames_per_video, inference=False, stickmen=False,
                 wire_dtype="float32"):
        self.image_size = image_size
        self.num_labels = num_labels
        self.num_enc_frames = num_enc_frames
        self.frames_per_video = frames_per_video
        self.inference = inference
        self.stickmen = stickmen
        # 'uint8': emit the uint8 wire format directly from the render
        # cache (no per-batch f32->u8 pass, ~4x less host memory traffic;
        # values == quantize_batch_u8 of the f32 path)
        self.wire_dtype = wire_dtype
        self.loader = _SyntheticSampleLoader()

    def __len__(self):
        return self.num_labels

    def __getitem__(self, label):
        rng = (np.random.RandomState(666 + label)
               if self.loader.deterministic else np.random)
        frames = rng.randint(0, self.frames_per_video,
                             size=self.num_enc_frames + 1)
        u8 = self.wire_dtype == "uint8"
        if u8:
            enc = np.stack([render_face_u8(label, f, self.image_size)[0]
                            for f in frames[:-1]])
            driver, segm, target = render_face_u8(
                label, int(frames[-1]), self.image_size)
        else:
            enc = np.stack([render_face(label, f, self.image_size)[0]
                            for f in frames[:-1]])
            driver, segm = render_face(label, int(frames[-1]),
                                       self.image_size)
            target = None
        data_dict = {"enc_rgbs": enc,
                     "pose_input_rgbs": driver[None]}
        if self.stickmen:
            stick = render_stickman_u8 if u8 else render_stickman
            data_dict["enc_stickmen"] = np.stack(
                [stick(label, f, self.image_size) for f in frames[:-1]])
            data_dict["dec_stickmen"] = stick(
                label, int(frames[-1]), self.image_size)[None]
            data_dict["dec_keypoints"] = (
                synthetic_keypoints(label, int(frames[-1]),
                                    self.image_size).flatten()
                / self.image_size)[None]
        target_dict = {"label": int(label)}
        if not self.inference:
            data_dict["target_rgbs"] = target[None] if u8 \
                else (driver * segm)[None]
            target_dict["real_segm"] = segm[None]
        return data_dict, target_dict

    def get_other_sample_by_label(self, label, same_identity=False,
                                  deterministic=True):
        # each synthetic label is its own identity with one "video":
        # same-identity driving re-samples the same label (frames differ);
        # other-person driving picks the next identity
        if same_identity:
            return int(label)
        if deterministic:
            return (int(label) + 1) % self.num_labels
        other = int(np.random.randint(self.num_labels))
        return other if other != label else (other + 1) % self.num_labels


class SyntheticDataLoader:
    """Iterable of (data_dict, target_dict) numpy batches.

    Meta mode: each sample = one identity; K enc frames + 1 driver + target
    all from that identity's "video".  Fine-tune mode: single identity
    (label 0), one frame serving as identity/driver/target (reference
    ``voxceleb2_segmentation_nolandmarks.py:187-209``).
    """

    def __init__(self, image_size, batch_size, num_labels, num_enc_frames=8,
                 frames_per_video=32, finetune=False, inference=False,
                 seed=0, steps_per_epoch=None, stickmen=False,
                 wire_dtype="float32"):
        self.stickmen = stickmen
        self.wire_dtype = wire_dtype
        self.image_size = image_size
        self.batch_size = batch_size
        self.num_labels = num_labels
        self.num_enc_frames = num_enc_frames
        self.frames_per_video = frames_per_video
        self.finetune = finetune
        self.inference = inference
        self.seed = seed
        self.steps_per_epoch = steps_per_epoch or max(
            1, num_labels // batch_size)
        self.deterministic = False
        self.epoch = 0
        # discriminator label-matrix height (1 when fine-tuning, reference
        # voxceleb.py:83-99)
        self.num_labels = 1 if finetune else num_labels
        # index-based view for fixed probes + cross-driving visuals
        # (meta mode only; the fine-tune loop never cross-drives)
        self.dataset = None if finetune else SyntheticDataset(
            image_size, self.num_labels, num_enc_frames, frames_per_video,
            inference=inference, stickmen=stickmen, wire_dtype=wire_dtype)

    def __len__(self):
        return self.steps_per_epoch

    def sample(self, label: int, rng: np.random.RandomState, extras=None):
        frames = rng.randint(0, self.frames_per_video,
                             size=self.num_enc_frames + 2)
        u8 = self.wire_dtype == "uint8"

        def face(f):
            if u8:
                img, segm, target = render_face_u8(label, f,
                                                   self.image_size)
            else:
                img, segm = render_face(label, f, self.image_size)
                target = None
            return img, segm, target

        if self.finetune:
            f = frames[0]
            img, segm, pre_target = face(f)
            enc = np.stack([img] * self.num_enc_frames)
            driver, target, tsegm = img, (pre_target if u8 else img), segm
            enc_frames, drv_frame = [f] * self.num_enc_frames, f
        else:
            enc = np.stack([face(f)[0]
                            for f in frames[:self.num_enc_frames]])
            driver, tsegm, pre_target = face(frames[-2])
            target = pre_target if u8 else driver
            enc_frames, drv_frame = frames[:self.num_enc_frames], frames[-2]
        if self.stickmen and extras is not None:
            stick = render_stickman_u8 if u8 else render_stickman
            extras.append({
                "enc_stickmen": np.stack(
                    [stick(label, f, self.image_size)
                     for f in enc_frames]),
                "dec_stickmen": stick(
                    label, int(drv_frame), self.image_size)[None],
                "dec_keypoints": (synthetic_keypoints(
                    label, int(drv_frame), self.image_size).flatten()
                    / self.image_size)[None],
            })
        return enc, driver, target, tsegm

    def get_batch(self, it: int):
        rng = np.random.RandomState(
            self.seed + it + 100003 * self.epoch
            if not self.deterministic else 666 + it)
        labels = rng.randint(0, self.num_labels, size=self.batch_size)
        encs, drivers, targets, segms, extras = [], [], [], [], []
        for lb in labels:
            e, d, t, s = self.sample(int(lb), rng, extras)
            encs.append(e)
            drivers.append(d)
            targets.append(t)
            segms.append(s)
        data_dict = {
            "enc_rgbs": np.stack(encs),
            "pose_input_rgbs": np.stack(drivers)[:, None],
        }
        if extras:
            for key in extras[0]:
                data_dict[key] = np.stack([x[key] for x in extras])
        if self.wire_dtype == "uint8":
            # targets come pre-masked from the u8 render cache
            target_rgbs = np.stack(targets)[:, None]
        else:
            target_rgbs = (np.stack(targets)
                           * np.stack(segms))[:, None].astype(np.float32)
        target_dict = {
            "target_rgbs": target_rgbs,
            "real_segm": np.stack(segms)[:, None],
            "label": labels.astype(np.int32),
        }
        return data_dict, target_dict

    def __iter__(self):
        for it in range(self.steps_per_epoch):
            yield self.get_batch(it)
        self.epoch += 1
