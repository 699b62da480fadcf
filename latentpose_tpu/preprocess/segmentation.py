"""Background (head+body) segmentation stage.

The reference uses the Graphonomy universal human parser as a git submodule
with multi-scale TTA at scales 0.75/1.0/1.5/2.0
(``preprocess_dataset.sh:128-145``).  Here the stage is a pluggable backend:

- ``GraphonomyBackend``: a converted-weights port hook (the full Graphonomy
  graph-transfer network is out of round-1 scope; the hook validates weight
  presence and fails loudly otherwise);
- ``GrabCutBackend``: a dependency-free classical fallback (cv2 GrabCut
  seeded by the face bbox region) — adequate for hermetic pipeline tests,
  clearly logged as NOT paper-parity;

Both are wrapped by ``segment_with_tta`` implementing the reference's
multi-scale average + threshold.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger("latentpose_tpu.preprocess.segmentation")

TTA_SCALES = (0.75, 1.0, 1.5, 2.0)


class GrabCutBackend:
    """cv2.grabCut seeded with a centered face region (fallback only)."""

    def __init__(self):
        logger.warning(
            "Using the GrabCut segmentation fallback — NOT Graphonomy "
            "parity; convert Graphonomy weights for paper-parity masks.")

    def __call__(self, image_rgb_uint8):
        import cv2
        h, w = image_rgb_uint8.shape[:2]
        mask = np.zeros((h, w), np.uint8)
        rect = (w // 8, h // 12, w * 3 // 4, h * 7 // 8)
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        try:
            cv2.grabCut(image_rgb_uint8[..., ::-1].copy(), mask, rect, bgd,
                        fgd, 3, cv2.GC_INIT_WITH_RECT)
        except cv2.error:
            return np.ones((h, w), np.float32)
        fg = (mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)
        return fg.astype(np.float32)


class GraphonomyBackend:
    """JAX Graphonomy port (preprocess/graphonomy.py), weight-gated."""

    def __init__(self, weights_path):
        import jax
        from latentpose_tpu.utils.weights import load_flat_npz_variables
        from latentpose_tpu.preprocess.graphonomy import (Graphonomy,
                                                          person_mask)
        self.model = Graphonomy()
        self.variables = load_flat_npz_variables(weights_path)

        @jax.jit
        def segment(images):
            probs = self.model.apply(self.variables, images, train=False)
            return person_mask(probs)

        self._segment = segment
        logger.info("Graphonomy backend active (%s)", weights_path)

    def __call__(self, image_rgb_uint8):
        x = image_rgb_uint8.astype(np.float32)[None] / 255.0
        return np.asarray(self._segment(x))[0]


def segment_with_tta(backend, image_rgb_uint8, scales=TTA_SCALES,
                     threshold=0.5):
    """Multi-scale test-time-augmented segmentation (reference
    preprocess_dataset.sh --tta 0.75,1.0,1.5,2.0): run at each scale,
    average probability maps at the original resolution, threshold."""
    import cv2
    h, w = image_rgb_uint8.shape[:2]
    acc = np.zeros((h, w), np.float32)
    for s in scales:
        scaled = cv2.resize(image_rgb_uint8,
                            (max(8, int(w * s)), max(8, int(h * s))))
        prob = backend(scaled)
        acc += cv2.resize(prob, (w, h))
    acc /= len(scales)
    return (acc > threshold).astype(np.float32)


def make_segmentation_backend(weights_dir=None):
    from latentpose_tpu.utils.weights import find_weights_file
    path = find_weights_file("graphonomy.npz", weights_dir)
    if path is not None:
        return GraphonomyBackend(path)
    return GrabCutBackend()
