"""VGGFace identity perceptual loss (reference ``criterions/idt_embed.py``).

Crops the face region (keypoint-derived bbox if available, else the fixed
center crop of side 1/1.8) with a *differentiable* crop-and-resize (affine
grid + bilinear reflection sampling — ops/image.py), then applies the
VGGFace-16 perceptual loss.
"""

from __future__ import annotations

import jax.numpy as jnp

from latentpose_tpu.losses.common.perceptual_loss import PerceptualLoss
from latentpose_tpu.losses.common.util import strip_time
# gather-free separable crop (MXU path); numerically identical to
# ops/image.crop_and_resize (tests/test_resample.py)
from latentpose_tpu.ops.resample import crop_and_resize


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--idt_embed_weight", type=float, default=2e-3)

    @staticmethod
    def get_net(args):
        return Criterion(args.idt_embed_weight, args.vgg_weights_dir,
                         compute_dtype=getattr(args, "compute_dtype",
                                               "float32"),
                         allow_random=getattr(args, "allow_random_vgg",
                                              False))


def compute_bboxes_from_keypoints(keypoints):
    """keypoints: (B, 68*2) in pixels -> (B, 4) rows (t, b, l, r).

    Parity with reference ``criterions/idt_embed.py:85-104`` (note: the
    reference's min/max for the horizontal midpoint are over the *whole
    batch* — reproduced as-is).
    """
    kp = keypoints.reshape(-1, 68, 2).astype(jnp.float32)
    x = kp[..., 0].T  # (68, B)
    y = kp[..., 1].T

    face_height = y[8] - y[27]
    b = y[8] + face_height * 0.2
    t = y[27] - face_height * 0.47

    midpoint_x = (x.min() + x.max()) / 2
    half_height = (b - t) * 0.5
    l = midpoint_x - half_height
    r = midpoint_x + half_height
    return jnp.stack([t, b, l, r], axis=1)


class Criterion:
    def __init__(self, idt_embed_weight, vgg_weights_dir,
                 compute_dtype="float32", allow_random=False):
        self.idt_embed_crit = PerceptualLoss(idt_embed_weight,
                                             vgg_weights_dir, net="face",
                                             compute_dtype=compute_dtype,
                                             allow_random=allow_random)

    def __call__(self, data_dict):
        fake_rgb = strip_time(data_dict["fake_rgbs"])
        real_rgb = strip_time(data_dict["target_rgbs"])
        h, w = real_rgb.shape[1:3]

        if data_dict.get("dec_keypoints") is not None:
            bboxes = compute_bboxes_from_keypoints(data_dict["dec_keypoints"])
            # keypoints are normalized [0, 1] -> pixels
            bboxes = bboxes * jnp.array([h, h, w, w], jnp.float32)
        else:
            crop_factor = 1 / 1.8
            t = h * (1 - crop_factor) / 2
            l = w * (1 - crop_factor) / 2
            row = jnp.array([t, h - t, l, w - l], jnp.float32)
            bboxes = jnp.broadcast_to(row, (fake_rgb.shape[0], 4))

        fake_cropped = crop_and_resize(fake_rgb, bboxes)
        real_cropped = crop_and_resize(real_rgb, bboxes)
        return {"VGGFace": self.idt_embed_crit(fake_cropped, real_cropped)}
