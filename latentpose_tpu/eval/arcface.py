"""ArcFace LResNet100E-IR identity descriptor network (JAX/flax port).

The reference eval harness uses InsightFace's MXNet model-r100-ii
(``compute_pose_identity_error.py:86-95``) to compute 512-d face descriptors.
This is the same architecture in flax (IR blocks, [3, 13, 30, 3] stages,
PReLU activations, BN-Dropout-FC-BN head, 112x112 input, (x-127.5)/128
preprocessing, optional flip-averaging).  Weights are converted offline from
the MXNet params file with ``tools/convert_arcface_weights.py``; without
them the harness falls back to the proxy descriptor backend
(eval/backends.py) with a loud warning.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn


def _bn(train, name, eps=2e-5):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=eps, name=name)


class PReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (self.features,))
        return jnp.where(x >= 0, x, x * alpha)


class IRBlock(nn.Module):
    """insightface unit: BN -> conv3x3 -> BN -> PReLU -> conv3x3(s) -> BN,
    shortcut conv1x1(s)+BN when shape changes."""

    features: int
    stride: int = 1
    has_shortcut_conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _bn(train, "bn1")(x)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv1")(h)
        h = _bn(train, "bn2")(h)
        h = PReLU(self.features, name="prelu")(h)
        h = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride), padding=1,
                    use_bias=False, name="conv2")(h)
        h = _bn(train, "bn3")(h)
        if self.has_shortcut_conv:
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        name="conv1sc")(x)
            x = _bn(train, "sc")(x)
        return h + x


class ArcFaceR100(nn.Module):
    """LResNet100E-IR: 512-d L2-normalized descriptor from (B,112,112,3)."""

    embedding_size: int = 512
    stage_blocks: Sequence[int] = (3, 13, 30, 3)
    stage_features: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = None

    @nn.compact
    def __call__(self, images_uint8_rgb, train: bool = False):
        # insightface preprocessing: (x - 127.5) / 128
        x = (images_uint8_rgb.astype(jnp.float32) - 127.5) / 128.0

        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="conv0")(x)
        h = _bn(train, "bn0")(h)
        h = PReLU(64, name="prelu0")(h)

        in_features = 64
        for s, (blocks, features) in enumerate(
                zip(self.stage_blocks, self.stage_features)):
            for i in range(blocks):
                stride = 2 if i == 0 else 1
                h = IRBlock(features, stride,
                            has_shortcut_conv=(stride != 1
                                               or in_features != features),
                            name=f"stage{s + 1}_unit{i + 1}")(h, train)
                in_features = features

        h = _bn(train, "bn1")(h)
        h = nn.Dropout(0.4, deterministic=not train)(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(self.embedding_size, name="fc1")(h)
        h = _bn(train, "fc1_bn")(h)
        return h


def normalize_embeddings(emb):
    return emb / jnp.maximum(
        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
