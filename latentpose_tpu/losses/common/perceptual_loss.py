"""Caffe-VGG19 / VGGFace-VGG16 perceptual loss.

Behavioral parity with the reference ``criterions/common/perceptual_loss.py``:
- backbone truncated at 30 layers, MaxPool -> AvgPool (see nn/vgg.py);
- inputs remapped ``(x + 1) / 2`` then caffe-normalized: mean
  (103.939, 116.779, 123.680)/255 per channel in that order (the reference
  applies the BGR means to RGB tensors without a channel flip — we reproduce
  that exactly), std 1/255 — i.e. effectively ``x * 255 - mean_255``;
- loss = sum of mean-| · | feature differences at every ReLU, target
  stop-gradiented, scaled by ``weight``.

Pretrained weights come from ``tools/convert_torch_weights.py`` conversions of
the reference's ``vgg19-d01eb7cb.pth`` / ``vgg_face_weights.pth`` (discovery
order: explicit dir, $LATENTPOSE_WEIGHTS_DIR, <repo>/weights/ — see
WEIGHTS.md).  If absent, construction HARD-ERRORS unless ``allow_random=True``
(CLI: ``--allow_random_vgg``), in which case the tower is deterministically
random-initialized — still a valid perceptual metric for hermetic tests, but
explicitly not paper-parity.  The reference fails loudly too: it
``torch.load``s the .pth files unconditionally
(``criterions/common/perceptual_loss.py:32-60``).
"""

from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp

from latentpose_tpu.nn.vgg import VGG16_CFG, VGG19_CFG, VGGFeatures
from latentpose_tpu.utils.weights import (find_weights_file,
                                          missing_weights_error)

logger = logging.getLogger("latentpose_tpu.losses.perceptual")

_CAFFE_MEAN = np.array([103.939, 116.779, 123.680], np.float32) / 255.0
_CAFFE_STD = np.array([1.0, 1.0, 1.0], np.float32) / 255.0

WEIGHT_FILES = {
    "caffe": "vgg19_caffe.npz",
    "face": "vgg_face.npz",
}


def _load_npz_params(path):
    """Load converted weights: keys 'conv<i>/kernel', 'conv<i>/bias'."""
    raw = np.load(path)
    params = {}
    for key in raw.files:
        mod, leaf = key.split("/")
        params.setdefault(mod, {})[leaf] = jnp.asarray(raw[key])
    return {"params": params}


class PerceptualLoss:
    """Callable, jit-compatible: arrays in, scalar out.

    The frozen VGG params are captured as constants; XLA hoists them so they
    live on-device once per compiled program.
    """

    def __init__(self, weight, vgg_weights_dir, net="caffe",
                 compute_dtype="float32", allow_random=False):
        self.weight = float(weight)
        self.net = net
        self.compute_dtype = jnp.bfloat16 \
            if compute_dtype == "bfloat16" else jnp.float32
        cfg = VGG19_CFG if net in ("caffe", "pytorch") else VGG16_CFG
        self.module = VGGFeatures(cfg=cfg, num_layers=30,
                                  dtype=self.compute_dtype
                                  if self.compute_dtype != jnp.float32
                                  else None)

        path = None
        if net in WEIGHT_FILES:
            path = find_weights_file(WEIGHT_FILES[net], vgg_weights_dir)
        if path is not None:
            self.variables = _load_npz_params(path)
            logger.info("PerceptualLoss(%s): loaded weights from %s",
                        net, path)
        else:
            if not allow_random:
                raise missing_weights_error(
                    WEIGHT_FILES.get(net, f"<{net}>"),
                    f"PerceptualLoss({net})", "--allow_random_vgg",
                    vgg_weights_dir)
            dummy = jnp.zeros((1, 32, 32, 3))
            self.variables = self.module.init(jax.random.PRNGKey(0), dummy)
            logger.warning(
                "PerceptualLoss(%s): no pretrained weights found under %r — "
                "using a deterministic random tower (tests only; convert the "
                "reference .pth files with tools/convert_torch_weights.py "
                "for paper-parity losses)", net, vgg_weights_dir)

        self.mean = jnp.asarray(_CAFFE_MEAN)
        self.std = jnp.asarray(_CAFFE_STD)

    def _normalize(self, x):
        return (x - self.mean) / self.std

    def __call__(self, input, target):
        """input/target: (B, H, W, 3) in the generator's output range."""
        x = (input + 1.0) / 2.0
        y = (jax.lax.stop_gradient(target) + 1.0) / 2.0
        cd = self.compute_dtype
        feats_x = self.module.apply(self.variables,
                                    self._normalize(x).astype(cd))
        feats_y = self.module.apply(self.variables,
                                    self._normalize(y).astype(cd))
        loss = 0.0
        for fx, fy in zip(feats_x, feats_y):
            # feature diffs accumulate in f32 even on the bf16 tower path
            loss = loss + jnp.mean(
                jnp.abs(fx - fy).astype(jnp.float32))
        return loss * self.weight
