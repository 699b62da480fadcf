"""FAN 68-landmark detector (Bulat & Tzimiropoulos 2017) — JAX/flax port.

The reference eval harness and the preprocessing cropper use the
``face-alignment`` package's 2D-FAN (``compute_pose_identity_error.py:
371-385``, ``utils/crop_as_in_dataset.py:18-22``).  Architecture: a 7x7/2
stem, three ConvBlocks, then 4 stacked hourglass modules (depth 4, 256
features) each emitting 68 heatmaps at 64x64; landmark = argmax + quarter-
pixel refinement toward the neighboring pixel, mapped back through the crop.

Weights convert from the torch .pth with ``tools/convert_fan_weights.py``;
absent weights -> proxy landmark backend.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class ConvBlock(nn.Module):
    """face-alignment ConvBlock: 3 BN-ReLU-conv branches (out/2, out/4,
    out/4) concatenated, with 1x1 downsample shortcut when needed."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        o2, o4 = self.out_features // 2, self.out_features // 4
        h = _bn(train, "bn1")(x)
        h = nn.relu(h)
        b1 = nn.Conv(o2, (3, 3), padding=1, use_bias=False, name="conv1")(h)
        h2 = _bn(train, "bn2")(b1)
        h2 = nn.relu(h2)
        b2 = nn.Conv(o4, (3, 3), padding=1, use_bias=False, name="conv2")(h2)
        h3 = _bn(train, "bn3")(b2)
        h3 = nn.relu(h3)
        b3 = nn.Conv(o4, (3, 3), padding=1, use_bias=False, name="conv3")(h3)
        out = jnp.concatenate([b1, b2, b3], axis=-1)
        if self.in_features != self.out_features:
            s = _bn(train, "down_bn")(x)
            s = nn.relu(s)
            s = nn.Conv(self.out_features, (1, 1), use_bias=False,
                        name="down_conv")(s)
            return out + s
        return out + x


class Hourglass(nn.Module):
    depth: int = 4
    features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features

        def level(n, inp):
            up1 = ConvBlock(f, f, name=f"b1_{n}")(inp, train)
            low = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            low1 = ConvBlock(f, f, name=f"b2_{n}")(low, train)
            if n > 1:
                low2 = level(n - 1, low1)
            else:
                low2 = ConvBlock(f, f, name=f"b2plus_{n}")(low1, train)
            low3 = ConvBlock(f, f, name=f"b3_{n}")(low2, train)
            up2 = jax.image.resize(low3, up1.shape, "nearest")
            return up1 + up2

        return level(self.depth, x)


class FAN(nn.Module):
    num_modules: int = 4
    num_landmarks: int = 68
    dtype: Any = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (B, 256, 256, 3) float in [0, 1].
        Returns list of (B, 64, 64, 68) heatmaps (one per module)."""
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, name="conv1")(
            images)
        h = _bn(train, "bn1")(h)
        h = nn.relu(h)
        h = ConvBlock(64, 128, name="conv2")(h, train)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = ConvBlock(128, 128, name="conv3")(h, train)
        h = ConvBlock(128, 256, name="conv4")(h, train)

        outputs = []
        previous = h
        for m in range(self.num_modules):
            hg = Hourglass(4, 256, name=f"m{m}")(previous, train)
            ll = ConvBlock(256, 256, name=f"top_m_{m}")(hg, train)
            ll = nn.Conv(256, (1, 1), name=f"conv_last{m}")(ll)
            ll = _bn(train, f"bn_end{m}")(ll)
            ll = nn.relu(ll)
            heatmaps = nn.Conv(self.num_landmarks, (1, 1), name=f"l{m}")(ll)
            outputs.append(heatmaps)
            if m < self.num_modules - 1:
                previous = (previous
                            + nn.Conv(256, (1, 1), name=f"bl{m}")(ll)
                            + nn.Conv(256, (1, 1), name=f"al{m}")(heatmaps))
        return outputs


def heatmaps_to_landmarks(heatmaps):
    """(B, 64, 64, 68) -> (B, 68, 2) pixel coords in the 256-crop space,
    with the face-alignment quarter-pixel refinement."""
    b, hh, ww, n = heatmaps.shape
    hm = jnp.transpose(heatmaps, (0, 3, 1, 2)).reshape(b, n, -1)
    idx = jnp.argmax(hm, axis=-1)
    ys = (idx // ww).astype(jnp.float32)
    xs = (idx % ww).astype(jnp.float32)

    def refine(hm2d, y, x):
        y_i = y.astype(jnp.int32)
        x_i = x.astype(jnp.int32)
        dx = jnp.sign(
            hm2d[y_i, jnp.clip(x_i + 1, 0, ww - 1)]
            - hm2d[y_i, jnp.clip(x_i - 1, 0, ww - 1)]) * 0.25
        dy = jnp.sign(
            hm2d[jnp.clip(y_i + 1, 0, hh - 1), x_i]
            - hm2d[jnp.clip(y_i - 1, 0, hh - 1), x_i]) * 0.25
        return y + dy, x + dx

    hm_full = jnp.transpose(heatmaps, (0, 3, 1, 2))
    ys, xs = jax.vmap(jax.vmap(refine))(hm_full, ys, xs)
    # 64-heatmap space -> 256-crop pixel space
    coords = jnp.stack([xs, ys], axis=-1) * 4.0
    return coords
