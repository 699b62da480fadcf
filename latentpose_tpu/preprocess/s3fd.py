"""S³FD face detector (Zhang et al. 2017) — JAX/flax port.

The reference preprocessing uses the ``face-alignment`` package's S3FD to
find face boxes before cropping (``utils/crop_as_in_dataset.py:21-22,
283-331``).  Architecture: VGG16 trunk (conv1_1..conv5_3), fc6/fc7 as
convolutions, two extra stages (conv6, conv7); detection heads on conv3_3
(L2Norm, max-out background label), conv4_3, conv5_3 (L2Norm'd), fc7,
conv6_2, conv7_2 with anchor strides 4..128 and scales 16..512.

Weights convert from the face-alignment ``s3fd`` checkpoint via
``tools/convert_torch_weights.py``; without them the detector is unavailable
and croppers require explicit bboxes (the hermetic path).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

VGG_CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
STRIDES = (4, 8, 16, 32, 64, 128)
SCALES = (16, 32, 64, 128, 256, 512)


class L2Norm(nn.Module):
    features: int
    init_scale: float = 10.0

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale",
                           nn.initializers.constant(self.init_scale),
                           (self.features,))
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)
        return x / norm * scale


class S3FD(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) float32, caffe-style preprocessed
        (RGB*255 - (123, 117, 104)).  Returns list of (cls, reg) per head."""
        sources = []
        h = x
        conv_idx = 1
        for stage, (features, reps) in enumerate(VGG_CFG, start=1):
            for i in range(reps):
                h = nn.Conv(features, (3, 3), padding=1,
                            name=f"conv{stage}_{i + 1}")(h)
                h = nn.relu(h)
            if stage == 3:
                sources.append(h)  # conv3_3
                h = nn.max_pool(h, (2, 2), strides=(2, 2),
                                padding=((0, 1), (0, 1)))  # ceil_mode
            else:
                if stage == 4:
                    sources.append(h)  # conv4_3
                if stage == 5:
                    sources.append(h)  # conv5_3
                if stage < 5:
                    h = nn.max_pool(h, (2, 2), strides=(2, 2))
                else:
                    h = nn.max_pool(h, (2, 2), strides=(2, 2))
        # fc6/fc7 as convs (fc6: k=3, pad=3, dilation=3 — size-preserving)
        h = nn.Conv(1024, (3, 3), padding=3, kernel_dilation=(3, 3),
                    name="fc6")(h)
        h = nn.relu(h)
        h = nn.Conv(1024, (1, 1), name="fc7")(h)
        h = nn.relu(h)
        sources.append(h)
        # extras
        h = nn.Conv(256, (1, 1), name="conv6_1")(h)
        h = nn.relu(h)
        h = nn.Conv(512, (3, 3), strides=(2, 2), padding=1,
                    name="conv6_2")(h)
        h = nn.relu(h)
        sources.append(h)
        h = nn.Conv(128, (1, 1), name="conv7_1")(h)
        h = nn.relu(h)
        h = nn.Conv(256, (3, 3), strides=(2, 2), padding=1,
                    name="conv7_2")(h)
        h = nn.relu(h)
        sources.append(h)

        sources[0] = L2Norm(256, 10.0, name="l2norm3")(sources[0])
        sources[1] = L2Norm(512, 8.0, name="l2norm4")(sources[1])
        sources[2] = L2Norm(512, 5.0, name="l2norm5")(sources[2])

        outputs = []
        for i, src in enumerate(sources):
            cls_ch = 4 if i == 0 else 2  # conv3_3 uses max-out background
            cls = nn.Conv(cls_ch, (3, 3), padding=1, name=f"cls{i}")(src)
            reg = nn.Conv(4, (3, 3), padding=1, name=f"reg{i}")(src)
            if i == 0:
                # max-out: background = max of first 3 channels
                bg = jnp.max(cls[..., :3], axis=-1, keepdims=True)
                cls = jnp.concatenate([bg, cls[..., 3:]], axis=-1)
            outputs.append((jax.nn.softmax(cls, axis=-1), reg))
        return outputs


def decode_detections(outputs, threshold=0.5):
    """Head outputs -> numpy (N, 5) [l, t, r, b, score] boxes (pre-NMS)."""
    boxes = []
    for i, (cls, reg) in enumerate(outputs):
        stride, scale = STRIDES[i], SCALES[i]
        score = np.asarray(cls[0, :, :, 1])
        ys, xs = np.where(score > threshold)
        for y, x in zip(ys, xs):
            s = score[y, x]
            dx, dy, dw, dh = np.asarray(reg[0, y, x])
            cx = x * stride + stride / 2 + dx * 0.1 * scale
            cy = y * stride + stride / 2 + dy * 0.1 * scale
            w = scale * np.exp(dw * 0.2)
            h = scale * np.exp(dh * 0.2)
            boxes.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2,
                          s])
    return np.array(boxes, np.float32).reshape(-1, 5)


def nms(boxes, iou_threshold=0.3):
    """Standard greedy NMS on (N, 5) [l, t, r, b, score]."""
    if len(boxes) == 0:
        return boxes
    order = boxes[:, 4].argsort()[::-1]
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) \
            * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return boxes[keep]
