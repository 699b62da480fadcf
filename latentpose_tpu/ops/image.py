"""Basic image ops in NHWC: nearest upsample, average pool, resize, crops.

These replace torch's nn.Upsample(scale_factor=2) (nearest) and AvgPool2d(2)
used by the reference blocks, plus the differentiable crop_and_resize of
``criterions/idt_embed.py:58-83`` (affine_grid + grid_sample with bilinear
sampling and reflection padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def upsample_nearest_2x(x):
    """(B, H, W, C) -> (B, 2H, 2W, C), nearest (torch Upsample default)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def avg_pool_2x(x):
    """AvgPool2d(kernel=2, stride=2) parity, NHWC."""
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") * 0.25


def grid_sample_bilinear(images, grid_x, grid_y):
    """Bilinear sampling with reflection padding, align_corners=False.

    images: (B, H, W, C); grid_x/grid_y: (B, Ho, Wo) in [-1, 1] normalized
    coordinates (torch grid_sample convention: -1 = left/top edge).
    """
    b, h, w, c = images.shape

    # unnormalize, align_corners=False: x_pix = ((x + 1) * W - 1) / 2
    fx = ((grid_x + 1.0) * w - 1.0) / 2.0
    fy = ((grid_y + 1.0) * h - 1.0) / 2.0

    # torch reflection padding (align_corners=False) reflects about the image
    # border (-0.5 / size-0.5): coordinate folding on x+0.5 over period 2*size.
    def reflect(f, size):
        t = f + 0.5
        period = 2.0 * size
        t = jnp.mod(t, period)
        t = jnp.where(t < 0, t + period, t)
        t = jnp.where(t >= size, period - t, t)
        return jnp.clip(t - 0.5, 0.0, size - 1.0)

    fx = reflect(fx, float(w))
    fy = reflect(fy, float(h))

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx = fx - x0
    wy = fy - y0

    x0i = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1i = jnp.clip(x1, 0, w - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1i = jnp.clip(y1, 0, h - 1).astype(jnp.int32)

    def gather(img, yi, xi):
        # img: (H, W, C); yi, xi: (Ho, Wo)
        return img[yi, xi]  # advanced indexing -> (Ho, Wo, C)

    gather_b = jax.vmap(gather, in_axes=(0, 0, 0))
    v00 = gather_b(images, y0i, x0i)
    v01 = gather_b(images, y0i, x1i)
    v10 = gather_b(images, y1i, x0i)
    v11 = gather_b(images, y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def crop_and_resize(images, bboxes, target_size=None):
    """Differentiable crop+resize, parity with idt_embed.crop_and_resize.

    images: (B, H, W, C); bboxes: (B, 4) rows (t, b, l, r) in pixels.
    Returns (B, h, w, C) where (h, w) = target_size or (H, W).

    Reference builds an affine grid with
      sx = (r-l)/W, sy = (b-t)/H, tx = (l+r)/W - 1, ty = (t+b)/H - 1
    (align_corners=False) and samples bilinearly with reflection padding
    (``criterions/idt_embed.py:71-83``).
    """
    bsz, h, w, _ = images.shape
    ho, wo = target_size or (h, w)
    t, b, l, r = [bboxes[:, i].astype(jnp.float32) for i in range(4)]
    sx = (r - l) / w
    sy = (b - t) / h
    tx = (l + r) / w - 1.0
    ty = (t + b) / h - 1.0

    # base grid in [-1, 1], align_corners=False pixel centers
    ys = (jnp.arange(ho, dtype=jnp.float32) + 0.5) / ho * 2.0 - 1.0
    xs = (jnp.arange(wo, dtype=jnp.float32) + 0.5) / wo * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (Ho, Wo)

    grid_x = gx[None] * sx[:, None, None] + tx[:, None, None]
    grid_y = gy[None] * sy[:, None, None] + ty[:, None, None]
    return grid_sample_bilinear(images, grid_x, grid_y)


def resize_bilinear(images, size):
    """Plain bilinear resize (antialias off), NHWC."""
    b, _, _, c = images.shape
    return jax.image.resize(images, (b, size[0], size[1], c), "bilinear")
