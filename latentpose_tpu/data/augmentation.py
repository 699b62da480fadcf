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
import numpy as np

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
    return _blend(_bernoulli(k_apply, images.shape[0], _OP_P), out, images)


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
    return _blend(_bernoulli(k_apply, b, _OP_P), jnp.clip(out, 0, 1), images)


def additive_noise(key, images, max_scale=0.05):
    k_apply, k_scale, k_noise = jax.random.split(key, 3)
    b = images.shape[0]
    scale = jax.random.uniform(k_scale, (b, 1, 1, 1)) * max_scale
    noise = jax.random.normal(k_noise, images.shape) * scale
    return _blend(_bernoulli(k_apply, b, _OP_P),
                  jnp.clip(images + noise, 0, 1), images)


def brightness(key, images, max_add=10.0 / 255.0):
    k_apply, k_add = jax.random.split(key)
    b = images.shape[0]
    add = jax.random.uniform(k_add, (b, 1, 1, 1), minval=-max_add,
                             maxval=max_add)
    return _blend(_bernoulli(k_apply, b, _OP_P),
                  jnp.clip(images + add, 0, 1), images)


def multiply(key, images, low=0.5, high=1.5):
    k_apply, k_mul = jax.random.split(key)
    b = images.shape[0]
    mul = jax.random.uniform(k_mul, (b, 1, 1, 1), minval=low, maxval=high)
    return _blend(_bernoulli(k_apply, b, _OP_P),
                  jnp.clip(images * mul, 0, 1), images)


def contrast(key, images, low=0.75, high=1.25):
    """iaa.OneOf([LinearContrast((0.75, 1.25)), SigmoidContrast(cutoff=0.5,
    gain=(3, 11))]) (reference ``:72-75``): per sample, a fair coin picks the
    linear map (v-.5)*c+.5 or the skimage-style sigmoid
    1/(1+exp(gain*(cutoff-v)))."""
    k_apply, k_pick, k_c, k_g = jax.random.split(key, 4)
    b = images.shape[0]
    c = jax.random.uniform(k_c, (b, 1, 1, 1), minval=low, maxval=high)
    linear = (images - 0.5) * c + 0.5
    gain = jax.random.uniform(k_g, (b, 1, 1, 1), minval=3.0, maxval=11.0)
    sigmoid = jax.nn.sigmoid(gain * (images - 0.5))
    pick = _bernoulli(k_pick, b, 0.5)
    out = jnp.where(pick[:, None, None, None], linear, sigmoid)
    return _blend(_bernoulli(k_apply, b, _OP_P), jnp.clip(out, 0, 1), images)


def edge_detect_blobby(key, images, max_alpha=0.15, cell=8):
    """iaa.BlendAlphaSimplexNoise(iaa.EdgeDetect(alpha=(0, 0.15)))
    (reference ``:60-62``).

    EdgeDetect convolves with (1-a)*identity + a*[[0,1,0],[1,-4,1],[0,1,0]]
    and clips, i.e. edged = clip(x + a*(lap(x) - x)).  The simplex-noise
    blend mask (blobby per-pixel alpha in [0, 1]) is approximated by one
    octave of low-frequency noise: U(0, 1) drawn at 1/``cell`` resolution
    and bilinearly upsampled — the same "blend the edge image in random
    blobs" family, gather-free."""
    k_apply, k_alpha, k_mask = jax.random.split(key, 3)
    b, h, w, _ = images.shape
    a = jax.random.uniform(k_alpha, (b, 1, 1, 1)) * max_alpha
    xp = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    lap = (xp[:, :-2, 1:-1] + xp[:, 2:, 1:-1] + xp[:, 1:-1, :-2]
           + xp[:, 1:-1, 2:] - 4.0 * images)
    edged = jnp.clip(images + a * (lap - images), 0, 1)
    mask = jax.random.uniform(
        k_mask, (b, max(h // cell, 1), max(w // cell, 1), 1))
    mask = jax.image.resize(mask, (b, h, w, 1), method="bilinear")
    out = images + mask * (edged - images)
    return _blend(_bernoulli(k_apply, b, _OP_P), out, images)


def saturation(key, images, max_shift=20.0 / 255.0):
    k_apply, k_s = jax.random.split(key)
    b = images.shape[0]
    gray = images.mean(axis=-1, keepdims=True)
    s = 1.0 + jax.random.uniform(k_s, (b, 1, 1, 1), minval=-max_shift,
                                 maxval=max_shift) * 5.0
    out = gray + (images - gray) * s
    return _blend(_bernoulli(k_apply, b, _OP_P), jnp.clip(out, 0, 1), images)


def emboss(key, images, max_strength=0.5):
    """iaa.Emboss(alpha=(0, 1.0), strength=(0, 0.5)): 3x3 emboss kernel
    alpha-blended with identity, per sample (reference ``:57``)."""
    k_apply, k_alpha, k_s = jax.random.split(key, 3)
    b = images.shape[0]
    alpha = jax.random.uniform(k_alpha, (b, 1, 1, 1))
    s = jax.random.uniform(k_s, (b, 1, 1, 1)) * max_strength

    # effect kernel rows: [[-1-s, -s, 0], [-s, 1, s], [0, s, 1+s]]
    zeros = jnp.zeros_like(s)
    w = [[-1.0 - s, -s, zeros],
         [-s, jnp.ones_like(s), s],
         [zeros, s, 1.0 + s]]
    xp = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    h, wd = images.shape[1:3]
    effect = 0.0
    for dy in range(3):
        for dx in range(3):
            effect = effect + w[dy][dx] * xp[:, dy:dy + h, dx:dx + wd, :]
    out = images + (effect - images) * alpha
    return _blend(_bernoulli(k_apply, b, _OP_P), jnp.clip(out, 0, 1), images)


# numpy on purpose: module-level jnp constants become leaked tracers if
# this module is first imported while a jit trace is active
_JPEG_LUMA_Q = np.asarray([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)
_JPEG_CHROMA_Q = np.asarray([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float32)


def _dct8():
    k = jnp.arange(8, dtype=jnp.float32)
    m = jnp.sqrt(2.0 / 8.0) * jnp.cos(
        jnp.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / 16.0)
    return m.at[0].multiply(1.0 / jnp.sqrt(2.0))


def _jpeg_quantize_plane(plane, table):
    """plane: (B, H, W) in [0, 255]; table: (B, 1, 1, 8, 8).  Real JPEG
    math: 8x8 DCT-II -> quantize -> dequantize -> IDCT (two matmuls each —
    MXU work, not gathers)."""
    b, h, w = plane.shape
    m = _dct8()
    blocks = plane.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    coef = jnp.einsum("ij,bhwjk,lk->bhwil", m, blocks - 128.0, m)
    coef = jnp.round(coef / table) * table
    rec = jnp.einsum("ji,bhwjk,kl->bhwil", m, coef, m) + 128.0
    return rec.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def jpeg_roundtrip(images, quality):
    """Deterministic JPEG encode/decode simulation: YCbCr + 8x8 DCT
    quantization (+ 4:2:0 chroma subsampling when the size allows).
    images: (B, H, W, 3) in [0, 1]; quality: (B,) in [1, 100]."""
    b, h, w, _ = images.shape
    quality = jnp.asarray(quality, jnp.float32).reshape(b, 1, 1)
    scale = jnp.where(quality < 50.0, 5000.0 / quality,
                      200.0 - 2.0 * quality)  # libjpeg quality mapping

    def table(base):
        t = jnp.floor((base * scale[..., None, None] + 50.0) / 100.0)
        return jnp.clip(t, 1.0, 255.0)

    x = images * 255.0
    r, g, bl = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * bl
    cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0

    y = _jpeg_quantize_plane(y, table(_JPEG_LUMA_Q))
    if h % 16 == 0 and w % 16 == 0:  # 4:2:0: chroma at half resolution
        def sub(c):
            return c.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

        def up(c):
            return jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)

        cb = up(_jpeg_quantize_plane(sub(cb), table(_JPEG_CHROMA_Q)))
        cr = up(_jpeg_quantize_plane(sub(cr), table(_JPEG_CHROMA_Q)))
    else:
        cb = _jpeg_quantize_plane(cb, table(_JPEG_CHROMA_Q))
        cr = _jpeg_quantize_plane(cr, table(_JPEG_CHROMA_Q))

    cb = cb - 128.0
    cr = cr - 128.0
    out = jnp.stack([y + 1.402 * cr,
                     y - 0.344136 * cb - 0.714136 * cr,
                     y + 1.772 * cb], axis=-1) / 255.0
    return jnp.clip(out, 0, 1)


def jpeg_artifacts(key, images):
    """iaa.JpegCompression((70, 99)) (reference ``:68``): true DCT
    quantization per sample with quality ~ U(70, 99)."""
    k_apply, k_q = jax.random.split(key)
    b, h, w, _ = images.shape
    if h % 8 or w % 8:
        return images  # non-8-aligned sizes: skip (flagship is 256²)
    quality = jax.random.uniform(k_q, (b,), minval=70.0, maxval=99.0)
    out = jpeg_roundtrip(images, quality)
    return _blend(_bernoulli(k_apply, b, _OP_P), out, images)


def displace_axis_bilinear(images, disp, axis, max_disp):
    """Bounded-displacement bilinear warp along ONE spatial axis as a
    (2*max_disp+1)-term shifted weighted sum — no gathers.

    On TPU a per-pixel gather over a channels-minor image is serial scalar
    work: the gather-based elastic measured 21.7 ms of the train step's
    ~20 ms augmentation pass at batch 8, 256² while every other op is
    ~0.5 ms (tools/bench_augmentation.py).  Because |disp| <= max_disp, the
    bilinear sample at x+disp touches only integer offsets d in
    [-max_disp, max_disp], and its weight relu(1 - |disp - d|) is exactly
    the bilinear hat — so the warp is a short sum of aligned shifted
    copies, pure VPU sweeps.

    images: (B, H, W, C); disp: (B, H, W) in pixels; axis: 1 (H) or 2 (W).
    Border: edge clamp.
    """
    out = jnp.zeros_like(images)
    pad = [(0, 0)] * 4
    pad[axis] = (max_disp, max_disp)
    xp = jnp.pad(images, pad, mode="edge")
    n = images.shape[axis]
    for d in range(-max_disp, max_disp + 1):
        wgt = jnp.maximum(1.0 - jnp.abs(disp - d), 0.0)
        sl = [slice(None)] * 4
        sl[axis] = slice(max_disp + d, max_disp + d + n)
        out = out + wgt[..., None] * xp[tuple(sl)]
    return out


def elastic(key, images, alpha_range=(0.5, 3.5)):
    """sometimes(iaa.ElasticTransformation(alpha=(0.5, 3.5), sigma=0.15))
    (reference ``:76``): per-pixel displacement field ~ U(-1,1) * alpha
    pixels.  sigma=0.15 makes imgaug's gaussian smoothing of the field a
    near-identity, so the raw field is used.  `sometimes` halves the
    application probability on top of the pool coin.

    Applied as two sequential single-axis bounded warps (x then y) instead
    of one joint 2-D bilinear sample: same distribution family (independent
    per-pixel displacements <= alpha in each axis, bilinear interpolation),
    and each axis is gather-free (see :func:`displace_axis_bilinear`; for a
    single-axis field the two forms are bit-identical in the interior —
    tested)."""
    k_apply, k_alpha, k_d = jax.random.split(key, 3)
    b, h, w, _ = images.shape
    alpha = jax.random.uniform(k_alpha, (b, 1, 1),
                               minval=alpha_range[0], maxval=alpha_range[1])
    disp = jax.random.uniform(k_d, (b, h, w, 2), minval=-1.0,
                              maxval=1.0) * alpha[..., None]
    max_disp = int(np.ceil(alpha_range[1]))
    out = displace_axis_bilinear(images, disp[..., 0], 2, max_disp)
    out = displace_axis_bilinear(out, disp[..., 1], 1, max_disp)
    return _blend(_bernoulli(k_apply, b, _OP_P * 0.5), out, images)


# Per-op application probability.  The reference draws SomeOf(0..5) without
# replacement from an 11-op pool (count uniform on {0..5}, mean 2.5 -> per-op
# marginal 2.5/11); we give each op an independent coin with the same
# marginal (binomial with the same mean/marginals, no order coupling).
_OP_P = 2.5 / 11.0

PIXELWISE_OPS = (gaussian_blur, sharpen, emboss, edge_detect_blobby,
                 additive_noise, brightness, multiply, contrast, saturation,
                 jpeg_artifacts, elastic)


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


def augment_data_dict(key, batch, use_pixelwise=False, use_scale=False,
                      use_shift=False):
    """Apply :func:`augment_triplet` to a collated train batch (the
    driver/target/segm keys, each with a leading frame axis of 1).

    Shared by the jitted train step (fresh key per step) and the fixed-id
    probe evaluation, which passes a FIXED key — the reference re-seeds its
    imgaug pipeline to 666 before every probe round so probes see the same
    deterministic augmentations each time (``runners/holycow.py:344-387``).
    """
    if not (use_pixelwise or use_scale or use_shift):
        return batch
    if "target_rgbs" not in batch or "real_segm" not in batch \
            or "pose_input_rgbs" not in batch:
        return batch
    driver = batch["pose_input_rgbs"][:, 0]
    target = batch["target_rgbs"]
    target = target[:, 0] if target.ndim > 4 else target
    segm = batch["real_segm"]
    segm = segm[:, 0] if segm.ndim > 4 else segm
    driver, target, segm = augment_triplet(
        key, driver, target, segm, use_pixelwise=use_pixelwise,
        use_scale=use_scale, use_shift=use_shift)
    return {**batch, "pose_input_rgbs": driver[:, None],
            "target_rgbs": target[:, None], "real_segm": segm[:, None]}
