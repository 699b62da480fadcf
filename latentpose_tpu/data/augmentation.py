"""On-device augmentation — the TPU-native replacement of the reference's
imgaug pipelines (``dataloaders/common/augmentation.py``).

The reference augments on CPU per-sample with imgaug: a SomeOf(0..5) bag of
pixelwise ops + 50%-probability affine scale on the *driver*, and a
50%-probability affine shift applied with a *shared* deterministic state to
(driver, target, segmentation) (``augment_triplet``, ``:123-142``).

Here each op is a vectorized, per-sample-PRNG jax transform; the whole
augmentation pass compiles into the train step (zero host work, zero extra
HBM round-trips).  Exact imgaug bit-parity is neither possible nor needed —
the *distribution family* (op set, strength ranges, application
probabilities) matches the reference's.

All functions take (key, images) with images (B, H, W, 3) float32 in [0, 1].
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from latentpose_tpu.ops.image import grid_sample_bilinear


def get_args(parser):
    parser.add("--use_pixelwise_augs", action="store_bool", default=False)
    parser.add("--use_affine_scale", action="store_bool", default=False)
    parser.add("--use_affine_shift", action="store_bool", default=False)
    return parser


def _bernoulli(key, batch, p=0.5):
    return jax.random.bernoulli(key, p, (batch,))


def _blend(apply_mask, augmented, original):
    return jnp.where(apply_mask[:, None, None, None], augmented, original)


def gaussian_blur(key, images, max_sigma=1.0):
    """Approximate iaa.GaussianBlur((0, 1.0)): fixed 5-tap blur blended with
    strength ~ U(0, 1) per sample."""
    k_apply, k_alpha = jax.random.split(key)
    kernel = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0])
    kernel = kernel / kernel.sum()

    def blur1d(x, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (2, 2)
        xp = jnp.pad(x, pad, mode="edge")
        out = 0.0
        for i in range(5):
            sl = [slice(None)] * 4
            sl[axis] = slice(i, i + xp.shape[axis] - 4)
            out = out + kernel[i] * xp[tuple(sl)]
        return out

    blurred = blur1d(blur1d(images, 1), 2)
    alpha = jax.random.uniform(k_alpha, (images.shape[0], 1, 1, 1))
    out = images + (blurred - images) * alpha
    return _blend(_bernoulli(k_apply, images.shape[0], 0.5), out, images)


def sharpen(key, images):
    """iaa.Sharpen(alpha=(0,1), lightness=(1,1.5)) family."""
    k_apply, k_alpha, k_light = jax.random.split(key, 3)
    b = images.shape[0]
    mean3 = jax.lax.reduce_window(
        jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
        0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID") / 9.0
    light = jax.random.uniform(k_light, (b, 1, 1, 1), minval=1.0, maxval=1.5)
    sharp = images * light + (images - mean3) * 1.0
    alpha = jax.random.uniform(k_alpha, (b, 1, 1, 1))
    out = images * (1 - alpha) + sharp * alpha
    return _blend(_bernoulli(k_apply, b, 0.5), jnp.clip(out, 0, 1), images)


def additive_noise(key, images, max_scale=0.05):
    k_apply, k_scale, k_noise = jax.random.split(key, 3)
    b = images.shape[0]
    scale = jax.random.uniform(k_scale, (b, 1, 1, 1)) * max_scale
    noise = jax.random.normal(k_noise, images.shape) * scale
    return _blend(_bernoulli(k_apply, b, 0.5),
                  jnp.clip(images + noise, 0, 1), images)


def brightness(key, images, max_add=10.0 / 255.0):
    k_apply, k_add = jax.random.split(key)
    b = images.shape[0]
    add = jax.random.uniform(k_add, (b, 1, 1, 1), minval=-max_add,
                             maxval=max_add)
    return _blend(_bernoulli(k_apply, b, 0.5),
                  jnp.clip(images + add, 0, 1), images)


def multiply(key, images, low=0.5, high=1.5):
    k_apply, k_mul = jax.random.split(key)
    b = images.shape[0]
    mul = jax.random.uniform(k_mul, (b, 1, 1, 1), minval=low, maxval=high)
    return _blend(_bernoulli(k_apply, b, 0.5),
                  jnp.clip(images * mul, 0, 1), images)


def contrast(key, images, low=0.75, high=1.25):
    k_apply, k_c = jax.random.split(key)
    b = images.shape[0]
    c = jax.random.uniform(k_c, (b, 1, 1, 1), minval=low, maxval=high)
    out = (images - 0.5) * c + 0.5
    return _blend(_bernoulli(k_apply, b, 0.5), jnp.clip(out, 0, 1), images)


def saturation(key, images, max_shift=20.0 / 255.0):
    k_apply, k_s = jax.random.split(key)
    b = images.shape[0]
    gray = images.mean(axis=-1, keepdims=True)
    s = 1.0 + jax.random.uniform(k_s, (b, 1, 1, 1), minval=-max_shift,
                                 maxval=max_shift) * 5.0
    out = gray + (images - gray) * s
    return _blend(_bernoulli(k_apply, b, 0.5), jnp.clip(out, 0, 1), images)


PIXELWISE_OPS = (gaussian_blur, sharpen, additive_noise, brightness,
                 multiply, contrast, saturation)


def pixelwise_augment(key, images):
    """SomeOf(0..5)-family: each op fires with its own coin per sample."""
    keys = jax.random.split(key, len(PIXELWISE_OPS))
    for op, k in zip(PIXELWISE_OPS, keys):
        images = op(k, images)
    return images


def sample_affine_params(key, batch, use_scale, use_shift):
    """Per-sample (sx, sy, tx, ty): scale U(0.8, 1.2) @ p=0.5, shift
    U(-0.05, 0.05) @ p=0.5 (reference ``:84-101``)."""
    k_s_apply, k_s, k_t_apply, k_t = jax.random.split(key, 4)
    sx = jnp.ones((batch,))
    sy = jnp.ones((batch,))
    tx = jnp.zeros((batch,))
    ty = jnp.zeros((batch,))
    if use_scale:
        apply = _bernoulli(k_s_apply, batch, 0.5)
        s = jax.random.uniform(k_s, (batch, 2), minval=0.8, maxval=1.2)
        sx = jnp.where(apply, s[:, 0], sx)
        sy = jnp.where(apply, s[:, 1], sy)
    if use_shift:
        apply = _bernoulli(k_t_apply, batch, 0.5)
        t = jax.random.uniform(k_t, (batch, 2), minval=-0.05, maxval=0.05)
        tx = jnp.where(apply, t[:, 0] * 2.0, tx)  # [-1,1] grid units
        ty = jnp.where(apply, t[:, 1] * 2.0, ty)
    return sx, sy, tx, ty


def apply_affine(images, sx, sy, tx, ty, separable=True):
    """Sample images on an affine grid (reflection padding, bilinear).
    scale >1 zooms in (imgaug semantics: object scaled up).

    The default path is the gather-free separable matmul resampler
    (ops/resample.py) — numerically identical, MXU instead of gathers."""
    if separable:
        from latentpose_tpu.ops.resample import affine_resample
        return affine_resample(images, sx, sy, tx, ty)
    b, h, w, _ = images.shape
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0 - 1.0
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid_x = gx[None] / sx[:, None, None] - tx[:, None, None]
    grid_y = gy[None] / sy[:, None, None] - ty[:, None, None]
    return grid_sample_bilinear(images, grid_x, grid_y)


def augment_triplet(key, driver, target, segm, use_pixelwise=False,
                    use_scale=False, use_shift=False):
    """Parity with reference ``augment_triplet`` (``:123-142``):
    driver gets pixelwise + scale (its own randomness); the shift is drawn
    once and applied identically to driver, target, and segmentation.

    driver/target: (B, H, W, 3); segm: (B, H, W, 1).
    """
    if not (use_pixelwise or use_scale or use_shift):
        return driver, target, segm
    k_pix, k_scale, k_shift = jax.random.split(key, 3)
    b = driver.shape[0]

    if use_pixelwise:
        driver = pixelwise_augment(k_pix, driver)
    if use_scale:
        sx, sy, tx, ty = sample_affine_params(k_scale, b, True, False)
        driver = apply_affine(driver, sx, sy, tx, ty)
    if use_shift:
        _, _, tx, ty = sample_affine_params(k_shift, b, False, True)
        ones = jnp.ones((b,))
        driver = apply_affine(driver, ones, ones, tx, ty)
        target = apply_affine(target, ones, ones, tx, ty)
        segm = apply_affine(segm, ones, ones, tx, ty)
    return driver, target, segm
