"""X2Face generator reproduction (reference ``generators/X2Face.py``).

The reference wraps the original authors' frozen pretrained torch model:
identity frames -> embedding UNet -> embedded face; driver frame ->
driving UNet -> dense sampling grid; output = embedded face warped by the
grid.  ``enable_finetuning`` stores the avatar's identity images as a
(frozen-model) parameter (reference ``:24,74-77``).

This implementation is the same computation natively (nn/unet.py +
ops/image.grid_sample_bilinear) — batched, no per-sample python loop
(reference ``:79-101`` loops in python).  Using the original paper weights
requires conversion of the X2Face release checkpoint; without it the module
runs (e.g. for pipeline tests) with random weights and a loud warning from
the wrapper.
"""

from __future__ import annotations

import logging
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.nn.unet import UNet
from latentpose_tpu.ops.image import grid_sample_bilinear

logger = logging.getLogger("latentpose_tpu.models.x2face")


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--X2Face_num_identity_images", type=int, default=1)

    @staticmethod
    def get_net(args):
        from latentpose_tpu.utils.weights import find_weights_file
        if find_weights_file("x2face.npz") is None:
            logger.warning(
                "X2Face generator: converted X2Face weights (x2face.npz) "
                "not found — weights are randomly initialized (pipeline/"
                "ablation use only; see WEIGHTS.md)")
        return Generator()


class Generator(nn.Module):
    INPUT_KEYS = ("enc_rgbs", "pose_input_rgbs")
    FINETUNE_PARAM = "none"  # frozen model; identity images saved at FT time
    # converted release weights (runners/build.overlay_pretrained):
    # (target subtree, npz file, source subtree in the file)
    PRETRAINED = (("", "x2face.npz", ""),)

    dtype: Any = None

    def setup(self):
        self.embedding_net = UNet(out_features=3, name="embedding_net")
        self.driving_net = UNet(out_features=2, name="driving_net")

    def __call__(self, inputs, update_stats: bool = False):
        """enc_rgbs: (B, K, H, W, 3) identity frames (averaged embedded
        face); pose_input_rgbs: (B, 1, H, W, 3) driver."""
        enc = inputs["enc_rgbs"]
        driver = inputs["pose_input_rgbs"]
        driver = driver[:, 0] if driver.ndim > 4 else driver

        b, k = enc.shape[:2]
        embedded = self.embedding_net(
            enc.reshape((b * k,) + enc.shape[2:]))
        embedded = jnp.tanh(embedded).reshape((b, k) + embedded.shape[1:])
        embedded = embedded.mean(axis=1) * 0.5 + 0.5  # to [0, 1]

        grid = self.driving_net(driver)
        grid = jnp.tanh(grid)  # normalized sampling coords in [-1, 1]
        warped = grid_sample_bilinear(embedded, grid[..., 0], grid[..., 1])
        return warped, None

    def get_pose_vector(self, pose_input_rgbs):
        """The driving UNet bottleneck as a latent pose descriptor
        (reference embedders/X2Face_pretrained_embResNeXt.py:80-83)."""
        driver = pose_input_rgbs[:, 0] if pose_input_rgbs.ndim > 4 \
            else pose_input_rgbs
        _, bottleneck = self.driving_net(driver, return_bottleneck=True)
        return bottleneck.mean(axis=(1, 2))
