"""Separable (matmul-based) axis-aligned image resampling.

``grid_sample_bilinear`` (ops/image.py) is a general warp built on gathers —
correct, but gathers/scatters are the slowest primitive on TPU.  Every warp
this framework actually performs is *axis-aligned* (per-sample scale+shift:
the affine augmentations, idt_embed's differentiable face crop), for which
bilinear resampling factorizes into two small dense matmuls per sample:

    out[b] = W_y[b] @ img[b] @ W_x[b]^T        (per channel)

with W_y (H_out, H_in) and W_x (W_out, W_in) holding the two interpolation
taps per output row — built with broadcasted iota comparisons (one_hot), no
gathers anywhere, so both forward and backward run on the MXU.

Reflection padding matches torch grid_sample(padding_mode='reflection',
align_corners=False), same as ops/image.grid_sample_bilinear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reflect(coords, size):
    """Fold pixel coordinates into [0, size-1] about the -0.5/size-0.5
    borders (align_corners=False reflection)."""
    t = coords + 0.5
    period = 2.0 * size
    t = jnp.mod(t, period)
    t = jnp.where(t < 0, t + period, t)
    t = jnp.where(t >= size, period - t, t)
    return jnp.clip(t - 0.5, 0.0, size - 1.0)


def _interp_matrix(coords, in_size):
    """coords: (B, N_out) float source pixel coords (already reflected).

    Returns (B, N_out, in_size) with the two bilinear taps per row.
    """
    c0 = jnp.floor(coords)
    frac = coords - c0
    i0 = jnp.clip(c0, 0, in_size - 1).astype(jnp.int32)
    i1 = jnp.clip(c0 + 1, 0, in_size - 1).astype(jnp.int32)
    w0 = jax.nn.one_hot(i0, in_size, dtype=coords.dtype) \
        * (1.0 - frac)[..., None]
    w1 = jax.nn.one_hot(i1, in_size, dtype=coords.dtype) * frac[..., None]
    return w0 + w1


def resample_axis_aligned(images, src_y, src_x):
    """images: (B, H, W, C); src_y: (B, H_out); src_x: (B, W_out) — float
    source pixel coordinates per output row/column (before reflection)."""
    b, h, w, c = images.shape
    wy = _interp_matrix(_reflect(src_y, float(h)), h)   # (B, Ho, H)
    wx = _interp_matrix(_reflect(src_x, float(w)), w)   # (B, Wo, W)
    imgs = images.astype(src_y.dtype)
    tmp = jnp.einsum("bih,bhwc->biwc", wy, imgs,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("bkw,biwc->bikc", wx, tmp.astype(src_y.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(images.dtype)


def _output_centers(n_out, dtype=jnp.float32):
    """Normalized [-1, 1] output pixel centers, align_corners=False."""
    return (jnp.arange(n_out, dtype=dtype) + 0.5) / n_out * 2.0 - 1.0


def _to_pixels(norm_coords, size):
    return ((norm_coords + 1.0) * size - 1.0) / 2.0


def affine_resample(images, sx, sy, tx, ty):
    """Per-sample axis-aligned affine warp, semantics identical to
    data/augmentation.apply_affine (scale > 1 zooms in; t in grid units)."""
    b, h, w, _ = images.shape
    gy = _output_centers(h)
    gx = _output_centers(w)
    src_y_norm = gy[None, :] / sy[:, None] - ty[:, None]
    src_x_norm = gx[None, :] / sx[:, None] - tx[:, None]
    return resample_axis_aligned(images, _to_pixels(src_y_norm, float(h)),
                                 _to_pixels(src_x_norm, float(w)))


def crop_and_resize(images, bboxes, target_size=None):
    """Differentiable crop+resize, same contract as ops/image.crop_and_resize
    (reference ``criterions/idt_embed.py:58-83``), gather-free."""
    b, h, w, _ = images.shape
    ho, wo = target_size or (h, w)
    t, bb, l, r = [bboxes[:, i].astype(jnp.float32) for i in range(4)]
    sy = (bb - t) / h
    sx = (r - l) / w
    ty = (t + bb) / h - 1.0
    tx = (l + r) / w - 1.0
    gy = _output_centers(ho)
    gx = _output_centers(wo)
    src_y_norm = gy[None, :] * sy[:, None] + ty[:, None]
    src_x_norm = gx[None, :] * sx[:, None] + tx[:, None]
    return resample_axis_aligned(images, _to_pixels(src_y_norm, float(h)),
                                 _to_pixels(src_x_norm, float(w)))
