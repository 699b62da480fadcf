"""Identity / pose encoder backbones: ResNeXt-50 (32x4d) and MobileNetV2.

Structural parity with torchvision's implementations (the reference embedder
instantiates ``torchvision.models.resnext50_32x4d(num_classes=512)`` and
``mobilenet_v2(num_classes=256)`` —
``embedders/unsupervised_pose_separate_embResNeXt_segmentation.py:27-28``),
so that reference checkpoints can be weight-converted 1:1.

TPU notes: NHWC everywhere; BatchNorm keeps running stats in the
"batch_stats" collection (torch momentum 0.1 == flax momentum 0.9); under
pjit the batch statistics are computed over the *global* batch (an implicit
psum over the data axis), which replaces (and improves on) the reference's
per-GPU unsynced BN.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.ops import initializers as tinit
from latentpose_tpu.ops.grouped_conv import GroupedConv

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out",
                                              "truncated_normal")


def _bn(train: bool, name: str, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class Bottleneck(nn.Module):
    """torchvision ResNet Bottleneck with groups/width (ResNeXt flavor)."""

    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 4
    has_downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_features = self.planes * 4
        dt = self.dtype

        h = nn.Conv(width, (1, 1), use_bias=False, kernel_init=_conv_init,
                    dtype=dt, name="conv1")(x)
        h = _bn(train, "bn1", dt)(h)
        h = nn.relu(h)
        # MXU-efficient grouped conv (block-diagonal dense for small
        # channels-per-group — 4-8x faster than native grouped, see
        # ops/grouped_conv.py); parameter layout identical to nn.Conv's
        h = GroupedConv(width, (3, 3), strides=(self.stride, self.stride),
                        padding=1, groups=self.groups, use_bias=False,
                        kernel_init=_conv_init, dtype=dt,
                        name="conv2")(h)
        h = _bn(train, "bn2", dt)(h)
        h = nn.relu(h)
        h = nn.Conv(out_features, (1, 1), use_bias=False,
                    kernel_init=_conv_init, dtype=dt, name="conv3")(h)
        h = _bn(train, "bn3", dt)(h)

        if self.has_downsample:
            x = nn.Conv(out_features, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        kernel_init=_conv_init, dtype=dt,
                        name="downsample_conv")(x)
            x = _bn(train, "downsample_bn", dt)(x)
        return nn.relu(h + x)


class ResNeXt50(nn.Module):
    """resnext50_32x4d parity; final fc to ``num_classes`` (=512 identity)."""

    num_classes: int = 512
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype,
                    name="conv1")(x)
        h = _bn(train, "bn1", self.dtype)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        in_features = 64
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                s = stride if i == 0 else 1
                needs_ds = (s != 1) or (in_features != planes * 4)
                h = Bottleneck(planes, s, has_downsample=needs_ds,
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(h, train)
                in_features = planes * 4

        h = jnp.mean(h, axis=(1, 2))  # adaptive avg pool to 1x1
        h = nn.Dense(self.num_classes,
                     kernel_init=tinit.torch_conv_kernel_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="fc")(h)
        return h


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (expand -> depthwise -> project)."""

    in_features: int
    out_features: int
    stride: int
    expand_ratio: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(round(self.in_features * self.expand_ratio))
        use_res = self.stride == 1 and self.in_features == self.out_features
        dt = self.dtype

        h = x
        idx = 0
        if self.expand_ratio != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False,
                        kernel_init=_conv_init, dtype=dt,
                        name=f"conv{idx}")(h)
            h = _bn(train, f"bn{idx}", dt)(h)
            h = jnp.minimum(nn.relu(h), 6.0)
            idx += 1
        h = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=1, feature_group_count=hidden, use_bias=False,
                    kernel_init=_conv_init, dtype=dt, name=f"conv{idx}")(h)
        h = _bn(train, f"bn{idx}", dt)(h)
        h = jnp.minimum(nn.relu(h), 6.0)
        idx += 1
        h = nn.Conv(self.out_features, (1, 1), use_bias=False,
                    kernel_init=_conv_init, dtype=dt, name=f"conv{idx}")(h)
        h = _bn(train, f"bn{idx}", dt)(h)
        return x + h if use_res else h


class MobileNetV2(nn.Module):
    """mobilenet_v2 parity; final classifier to ``num_classes`` (=256 pose).

    Dropout(0.2) before the classifier is active only when ``train`` and a
    'dropout' rng is provided (torch parity).
    """

    num_classes: int = 256
    dtype: Any = None

    # (expand_ratio t, channels c, repeats n, stride s) — torchvision table
    SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype,
                    name="stem_conv")(x)
        h = _bn(train, "stem_bn", self.dtype)(h)
        h = jnp.minimum(nn.relu(h), 6.0)

        in_features = 32
        block_idx = 0
        for t, c, n, s in self.SETTINGS:
            for i in range(n):
                stride = s if i == 0 else 1
                h = InvertedResidual(in_features, c, stride, t,
                                     dtype=self.dtype,
                                     name=f"block{block_idx}")(h, train)
                in_features = c
                block_idx += 1

        h = nn.Conv(1280, (1, 1), use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype, name="head_conv")(h)
        h = _bn(train, "head_bn", self.dtype)(h)
        h = jnp.minimum(nn.relu(h), 6.0)

        h = jnp.mean(h, axis=(1, 2))
        h = nn.Dropout(0.2, deterministic=not train)(h)
        h = nn.Dense(self.num_classes,
                     kernel_init=nn.initializers.normal(0.01),
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="classifier")(h)
        return h
