"""Descriptor / landmark backends for the eval harness.

Real backends (ArcFace-r100, FAN) activate when converted weights are found
(discovery order: ``--eval_weights_dir``, $LATENTPOSE_WEIGHTS_DIR,
<repo>/weights/).  Without weights, the factories HARD-ERROR unless
``allow_proxy=True`` (CLI: ``--allow_proxy_eval``), in which case
deterministic proxy backends keep the whole protocol runnable hermetically
(absolute numbers are NOT comparable to the paper's — a loud warning says
so).  The reference fails loudly too: it imports insightface/face-alignment
models unconditionally (``compute_pose_identity_error.py:86-95``).
"""

from __future__ import annotations

import logging

import numpy as np

from latentpose_tpu.utils.weights import (find_weights_file,
                                          missing_weights_error)

logger = logging.getLogger("latentpose_tpu.eval.backends")

FACE_DESCRIPTOR_DIM = 512


def get_default_bbox(kind):
    """Crop-type-aware rough face bbox (t, l, b, r pixels clipped from a
    256² image) for when detection fails (reference ``:38-61``)."""
    if kind == "ffhq":
        return (0, 30, 60, 30)
    if kind == "x2face":
        return (37, (37 + 45) // 2, 45, (37 + 45) // 2)
    if kind == "latentpose":
        return (42, (42 + 64) // 2, 64, (42 + 64) // 2)
    raise ValueError(f"Wrong crop type: {kind}")


def procedural_mean_face(image_size=256):
    """A canonical 68-landmark layout used when detection fails (the
    reference embeds an empirical mean face; we synthesize an equivalent
    canonical layout from standard facial proportions)."""
    s = image_size / 256.0
    pts = []
    # jaw: 17 points along a lower half-ellipse
    for i in range(17):
        a = np.pi * (1.0 - i / 16.0)
        pts.append((128 + 52 * np.cos(a), 130 + 66 * np.sin(a) * 0.95))
    # brows: 5 points each
    for x0, x1 in ((86, 118), (138, 170)):
        for i in range(5):
            x = x0 + (x1 - x0) * i / 4
            pts.append((x, 108 - 6 * np.sin(np.pi * i / 4)))
    # nose bridge 4 + nostrils 5
    for i in range(4):
        pts.append((128, 116 + 10 * i))
    for i in range(5):
        pts.append((116 + 6 * i, 152))
    # eyes: 6 points each; index 36 = left-eye outer corner (leftmost),
    # index 45 = right-eye outer corner (rightmost) — standard iBUG-68
    for cx, a0 in ((102, np.pi), (154, np.pi)):
        for i in range(6):
            a = a0 + 2 * np.pi * i / 6
            pts.append((cx + 12 * np.cos(a), 122 - 5 * np.sin(a)))
    # outer lips 12 + inner lips 8
    for i in range(12):
        a = 2 * np.pi * i / 12
        pts.append((128 + 24 * np.cos(a), 172 - 10 * np.sin(a)))
    for i in range(8):
        a = 2 * np.pi * i / 8
        pts.append((128 + 14 * np.cos(a), 172 - 5 * np.sin(a)))
    return (np.array(pts[:68], np.float32) * s)


class ProxyDescriptorBackend:
    """Deterministic stand-in: center-cropped, downscaled, contrast-
    normalized image projected to 512-d and L2-normalized."""

    def __init__(self, seed=0):
        rng = np.random.RandomState(seed)
        self.projection = rng.randn(16 * 16 * 3, FACE_DESCRIPTOR_DIM) \
            .astype(np.float32) / np.sqrt(16 * 16 * 3)
        logger.warning(
            "Using the PROXY identity-descriptor backend (no ArcFace "
            "weights found). Identity-error numbers are only comparable "
            "within this framework, not to the paper.")

    def __call__(self, images, default_bbox):
        import cv2
        feats = []
        for image in images:
            h, w = image.shape[:2]
            # default bboxes are specified for 256² images; scale
            t, l, b, r = (int(v * h / 256) for v in default_bbox)
            crop = image[t:h - b, l:w - r]
            crop = cv2.resize(crop, (16, 16), interpolation=cv2.INTER_AREA)
            v = crop.astype(np.float32).reshape(-1)
            v = (v - v.mean()) / (v.std() + 1e-6)
            feats.append(v @ self.projection)
        feats = np.stack(feats)
        feats /= np.maximum(np.linalg.norm(feats, axis=-1, keepdims=True),
                            1e-12)
        return feats, 0


class ArcFaceBackend:
    def __init__(self, weights_path, flip=True):
        import jax
        from latentpose_tpu.eval.arcface import (ArcFaceR100,
                                                 normalize_embeddings)
        self.model = ArcFaceR100()
        from latentpose_tpu.utils.weights import load_flat_npz_variables
        self.variables = load_flat_npz_variables(weights_path)
        self.flip = flip

        @jax.jit
        def embed(images):
            e = self.model.apply(self.variables, images, train=False)
            if flip:
                e = e + self.model.apply(self.variables, images[:, :, ::-1],
                                         train=False)
            return normalize_embeddings(e)

        self._embed = embed
        logger.info("ArcFace backend active (%s)", weights_path)

    def __call__(self, images, default_bbox):
        import cv2
        crops = []
        for image in images:
            h, w = image.shape[:2]
            t, l, b, r = (int(v * h / 256) for v in default_bbox)
            crop = cv2.resize(image[t:h - b, l:w - r], (112, 112),
                              interpolation=cv2.INTER_CUBIC)
            crops.append(crop)
        emb = np.asarray(self._embed(np.stack(crops)))
        return emb, 0


class ProxyLandmarkBackend:
    """Stand-in landmarks: the canonical mean face scaled/shifted to the
    brightness-weighted face region (keeps self-driving pose error
    computable hermetically)."""

    def __init__(self):
        self.mean_face = procedural_mean_face()
        logger.warning(
            "Using the PROXY landmark backend (no FAN weights found). "
            "Pose-error numbers are only comparable within this framework.")

    def __call__(self, image):
        gray = image.astype(np.float32).mean(-1)
        mass = gray / max(gray.sum(), 1e-6)
        ys = (mass.sum(1) * np.arange(image.shape[0])).sum()
        xs = (mass.sum(0) * np.arange(image.shape[1])).sum()
        shift = np.array([xs - 128.0, ys - 128.0], np.float32)
        return self.mean_face + shift, True


class FANBackend:
    def __init__(self, weights_path):
        import jax
        from latentpose_tpu.eval.fan import FAN, heatmaps_to_landmarks
        from latentpose_tpu.utils.weights import load_flat_npz_variables
        self.model = FAN()
        self.variables = load_flat_npz_variables(weights_path)

        @jax.jit
        def detect(images):
            heatmaps = self.model.apply(self.variables, images, train=False)
            return heatmaps_to_landmarks(heatmaps[-1])

        self._detect = detect
        logger.info("FAN backend active (%s)", weights_path)

    def __call__(self, image):
        import cv2
        img = cv2.resize(image, (256, 256)).astype(np.float32) / 255.0
        lm = np.asarray(self._detect(img[None]))[0]
        scale = image.shape[1] / 256.0
        return lm * scale, True


def make_descriptor_backend(weights_dir, allow_proxy=False):
    path = find_weights_file("arcface_r100.npz", weights_dir)
    if path is not None:
        return ArcFaceBackend(path)
    if not allow_proxy:
        raise missing_weights_error(
            "arcface_r100.npz", "identity-descriptor backend",
            "--allow_proxy_eval", weights_dir)
    return ProxyDescriptorBackend()


def make_landmark_backend(weights_dir, allow_proxy=False):
    path = find_weights_file("fan_2d.npz", weights_dir)
    if path is not None:
        return FANBackend(path)
    if not allow_proxy:
        raise missing_weights_error(
            "fan_2d.npz", "landmark backend", "--allow_proxy_eval",
            weights_dir)
    return ProxyLandmarkBackend()
