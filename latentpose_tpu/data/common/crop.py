"""Bounding-box cropping with blur-faded reflection padding.

Numerics parity with the reference's preprocessing contract
(``dataloaders/voxceleb2_segmentation_nolandmarks.py:98-115,283-367``):

- the raw detector bbox (l, t, r, b in [0,1] of the source image) is squared
  around its center and scaled by 1.8;
- integer pixel coords: floor(l, t), ceil(r, b), re-squared, then +1 to make
  b/r exclusive;
- out-of-image areas are reflection-padded (BORDER_REFLECT101; segmentation:
  replicate sides/bottom, zero top), then progressively gaussian-blurred
  toward the pad borders (sigma = 0.016 * H), then faded to the image median
  color (segmentation: faded to 0 on left/right pads).

This runs host-side (cv2/numpy) in the input pipeline workers; images this
produces feed the TPU in batches.
"""

from __future__ import annotations

import math

import numpy as np

BBOX_SCALE = 1.8


def square_and_scale_bbox(l, t, r, b, scale=BBOX_SCALE):
    """Square the bbox around its center and scale (reference :98-112)."""
    cx, cy = (l + r) * 0.5, (t + b) * 0.5
    size = max(b - t, r - l) * scale
    half = size / 2
    return cx - half, cy - half, cx + half, cy + half


def bbox_to_integer_coords(t, l, b, r, image_h, image_w):
    """[0,1]-space bbox -> integer pixel coords, exactly square, exclusive.

    NOTE: the reference multiplies *all four* coordinates by image_h (not w)
    — VoxCeleb2.1 frames are square so it is equivalent; we reproduce it.
    (reference :319-331)
    """
    t, l, b, r = (v * image_h for v in (t, l, b, r))
    l, t = math.floor(l), math.floor(t)
    r, b = math.ceil(r), math.ceil(b)
    b += (r - l) - (b - t)  # restore exact squareness after rounding
    return t, l, b + 1, r + 1


def _edge_distance_mask(h, w, pad_top, pad_bottom, pad_left, pad_right):
    """1 at the outer pad edge, 0 at the original image border."""
    y = np.arange(h, dtype=np.float32)[:, None]
    x = np.arange(w, dtype=np.float32)[None, :]

    def ramp(dist, pad):
        if pad == 0:
            return np.full_like(dist, np.inf)
        return dist / pad

    near_l = ramp(x, pad_left)
    near_r = ramp(w - 1 - x, pad_right)
    near_t = ramp(y, pad_top)
    near_b = ramp(h - 1 - y, pad_bottom)
    horiz = 1.0 - np.minimum(near_l, near_r)
    vert = 1.0 - np.minimum(near_t, near_b)
    return np.maximum(horiz, vert), 1.0 - np.minimum(near_l, near_r)


def crop_with_padding(image, t, l, b, r, segmentation=False):
    """Crop image[t:b, l:r] allowing out-of-bounds, with blur-faded padding.

    image: uint8 (H, W, C) or (H, W).  Returns uint8 (b-t, r-l, ...).
    """
    import cv2

    t_in, b_in = max(0, t), min(b, image.shape[0])
    l_in, r_in = max(0, l), min(r, image.shape[1])
    cropped = image[t_in:b_in, l_in:r_in]

    pad_top, pad_bottom = t_in - t, b - b_in
    pad_left, pad_right = l_in - l, r - r_in
    if pad_top == pad_bottom == pad_left == pad_right == 0:
        return cropped

    if segmentation:
        # sides + bottom replicate; top pads with zeros (no head above frame)
        out = cv2.copyMakeBorder(cropped, 0, pad_bottom, pad_left, pad_right,
                                 cv2.BORDER_REPLICATE)
        out = cv2.copyMakeBorder(out, pad_top, 0, 0, 0, cv2.BORDER_CONSTANT)
    else:
        out = cv2.copyMakeBorder(cropped, pad_top, pad_bottom, pad_left,
                                 pad_right, cv2.BORDER_REFLECT101)
    assert out.shape[:2] == (b - t, r - l)

    h, w = out.shape[:2]
    mask, horiz_mask = _edge_distance_mask(h, w, pad_top, pad_bottom,
                                           pad_left, pad_right)

    sigma = h * 0.016
    blurred = cv2.GaussianBlur(out, (0, 0), sigma)

    out_f = out.astype(np.float32) / 255.0
    blur_f = blurred.astype(np.float32) / 255.0
    if out_f.ndim < 3:
        out_f = out_f[..., None]
        blur_f = blur_f[..., None]
    mask3 = mask[..., None]

    # pads -> their blurred version; blur fades quickly into the interior
    out_f += (blur_f - out_f) * np.clip(mask3 * 3.0 + 1.0, 0.0, 1.0)

    # then fade pads toward a flat color
    if segmentation:
        fade = np.zeros_like(out_f)
        fade_mask = horiz_mask[..., None]
    else:
        fade = np.median(out_f, axis=(0, 1))
        fade_mask = mask3
    out_f += (fade - out_f) * np.clip(fade_mask, 0.0, 1.0)

    out_u8 = np.clip(np.rint(out_f * 255.0), 0, 255).astype(np.uint8)
    return out_u8 if out.ndim == 3 else out_u8[..., 0]
