"""Quantitative augmentation-distribution checks (VERDICT r3 item 6).

The reference augments with imgaug (``dataloaders/common/augmentation.py:
44-142``); ours is a vectorized on-device re-design asserting *distribution
family* parity.  imgaug is NOT installed in this environment (documented
deviation — VERDICT r3 assumed otherwise), so the quantitative anchors here
are chosen to stay independent of our own code:

1. real libjpeg (cv2.imencode/imdecode) vs our DCT-quantization JPEG
   simulation — per-quality distortion magnitude AND direct agreement;
2. real cv2.warpAffine (bilinear) vs our gather-free separable resampler for
   the affine scale/shift family — interior pixel parity;
3. closed-form moments of the reference's documented parameter ranges
   (Add(-10..10), Multiply(0.5..1.5), AdditiveGaussianNoise(0..0.05*255))
   vs empirical moments of our ops on applied samples;
4. per-op firing probability == the reference SomeOf((0,5), 11-op pool)
   marginal 2.5/11 (elastic: halved by its extra ``sometimes`` wrap,
   reference ``:76``), and the 50% affine application coins.
"""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentpose_tpu.data import augmentation as aug
from latentpose_tpu.data.synthetic import render_face


@pytest.fixture(scope="module")
def faces64():
    imgs = np.stack([render_face(lb, f, 64)[0]
                     for lb in range(8) for f in range(8)])
    return imgs.astype(np.float32)  # (64, 64, 64, 3) in [0, 1]


def applied_mask(out, orig):
    """Samples where the op's application coin fired."""
    return np.abs(np.asarray(out) - orig).reshape(len(orig), -1).max(1) > 0


# ---------------------------------------------------------------------------
# 1. JPEG: our DCT simulation vs the real libjpeg
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("quality", [70, 85, 95])
def test_jpeg_simulation_matches_libjpeg(faces64, quality):
    imgs = faces64
    ours = np.asarray(aug.jpeg_roundtrip(
        jnp.asarray(imgs), np.full(len(imgs), float(quality))))

    real = np.stack([
        cv2.imdecode(cv2.imencode(
            ".jpg", (im[..., ::-1] * 255).astype(np.uint8),
            [cv2.IMWRITE_JPEG_QUALITY, quality])[1],
            cv2.IMREAD_COLOR)[..., ::-1]
        for im in imgs]).astype(np.float32) / 255.0

    mae_ours = np.abs(ours - imgs).mean()
    mae_real = np.abs(real - imgs).mean()
    # distortion magnitude parity: same artifact strength family
    assert 0.5 * mae_real <= mae_ours <= 2.0 * mae_real, \
        (quality, mae_ours, mae_real)
    # direct agreement: the simulated decode tracks the real decode closely
    assert np.abs(ours - real).mean() <= 0.02, \
        (quality, np.abs(ours - real).mean())


# ---------------------------------------------------------------------------
# 2. Affine scale/shift: separable resampler vs real cv2.warpAffine
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sx,sy,tx,ty", [
    (1.2, 1.2, 0.0, 0.0),
    (0.8, 1.1, 0.0, 0.0),
    (1.0, 1.0, 0.05, -0.03),   # shift as fraction of size (imgaug percent)
    (0.9, 1.2, -0.04, 0.02),
])
def test_affine_matches_cv2_interior(faces64, sx, sy, tx, ty):
    imgs = faces64[:8]
    b, h, w, _ = imgs.shape
    out = np.asarray(aug.apply_affine(
        jnp.asarray(imgs),
        jnp.full(b, sx), jnp.full(b, sy),
        jnp.full(b, tx * 2.0), jnp.full(b, ty * 2.0)))  # [-1,1] grid units

    # cv2 ground truth: zoom about the pixel-grid center + shift.  Written
    # as the explicit inverse map src = (dst-c)/s + c - t (shift after the
    # inverse scale), matching apply_affine's sampling grid.  In production
    # (and the reference, augmentation.py:84-101) scale and shift are
    # separate augmenters, so the composition order only matters here.
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    m_inv = np.float32([[1 / sx, 0, cx - cx / sx - tx * w],
                        [0, 1 / sy, cy - cy / sy - ty * h]])
    ref = np.stack([
        cv2.warpAffine(im, m_inv, (w, h),
                       flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                       borderMode=cv2.BORDER_REFLECT)
        for im in imgs])

    # compare the interior (border conventions differ in the reflected
    # margin: ours is torch grid_sample 'reflection', cv2 BORDER_REFLECT
    # folds at a half-pixel offset; both are in imgaug's 'reflect' family)
    sl = slice(8, -8)
    diff = np.abs(out[:, sl, sl] - ref[:, sl, sl])
    assert diff.mean() <= 5e-3, diff.mean()
    assert np.quantile(diff, 0.99) <= 0.06, np.quantile(diff, 0.99)


# ---------------------------------------------------------------------------
# 3. Closed-form moments of the documented reference ranges
# ---------------------------------------------------------------------------

def test_brightness_moments(faces64):
    """iaa.Add((-10, 10)): delta ~ U(-10, 10)/255 per applied sample ->
    E[delta] = 0, E|delta| = 10/510 (reference ``:65``)."""
    imgs = np.clip(faces64, 0.1, 0.9)  # keep clipping out of the analytics
    out = np.asarray(aug.brightness(jax.random.PRNGKey(0),
                                    jnp.asarray(np.tile(imgs, (8, 1, 1, 1)))))
    orig = np.tile(imgs, (8, 1, 1, 1))
    mask = applied_mask(out, orig)
    assert mask.sum() >= 50
    delta = (out - orig)[mask]
    assert abs(delta.mean()) <= 0.004
    np.testing.assert_allclose(np.abs(delta).mean(), 10.0 / 510.0, rtol=0.25)


def test_multiply_moments(faces64):
    """iaa.Multiply((0.5, 1.5)): delta = (m-1)*x, m ~ U(0.5, 1.5) ->
    E[delta] = 0, E|delta| = E|m-1| * E[x] = 0.25 E[x] (reference ``:70``)."""
    imgs = np.clip(faces64, 0.05, 0.6)
    tiled = np.tile(imgs, (8, 1, 1, 1))
    out = np.asarray(aug.multiply(jax.random.PRNGKey(1), jnp.asarray(tiled)))
    mask = applied_mask(out, tiled)
    assert mask.sum() >= 50
    delta = (out - tiled)[mask]
    assert abs(delta.mean()) <= 0.25 * 0.15 * tiled.mean()
    np.testing.assert_allclose(np.abs(delta).mean(), 0.25 * tiled.mean(),
                               rtol=0.3)


def test_additive_noise_moments(faces64):
    """iaa.AdditiveGaussianNoise(scale=(0, 0.05*255)): per-sample sigma ~
    U(0, 0.05), pixel delta a scale mixture -> std = 0.05/sqrt(3)
    (reference ``:63``)."""
    imgs = np.clip(faces64, 0.2, 0.8)
    tiled = np.tile(imgs, (8, 1, 1, 1))
    out = np.asarray(aug.additive_noise(jax.random.PRNGKey(2),
                                        jnp.asarray(tiled)))
    mask = applied_mask(out, tiled)
    assert mask.sum() >= 50
    delta = (out - tiled)[mask]
    np.testing.assert_allclose(delta.std(), 0.05 / np.sqrt(3.0), rtol=0.2)
    assert abs(delta.mean()) <= 0.002


# ---------------------------------------------------------------------------
# 4. Application probabilities: SomeOf((0,5), 11 ops) marginals + coins
# ---------------------------------------------------------------------------

def test_pool_size_matches_reference():
    # reference pixelwise pool (augmentation.py:44-81): blur-OneOf, Sharpen,
    # Emboss, BlendAlphaSimplexNoise(EdgeDetect), AdditiveGaussianNoise,
    # Add, AddToSaturation, JpegCompression, Multiply, contrast-OneOf,
    # sometimes(ElasticTransformation) -> 11 members
    assert len(aug.PIXELWISE_OPS) == 11
    assert abs(aug._OP_P - 2.5 / 11.0) < 1e-9


@pytest.mark.parametrize("op,p", [
    (aug.gaussian_blur, aug._OP_P),
    (aug.sharpen, aug._OP_P),
    (aug.emboss, aug._OP_P),
    (aug.edge_detect_blobby, aug._OP_P),
    (aug.additive_noise, aug._OP_P),
    (aug.brightness, aug._OP_P),
    (aug.multiply, aug._OP_P),
    (aug.contrast, aug._OP_P),
    (aug.saturation, aug._OP_P),
    (aug.jpeg_artifacts, aug._OP_P),
    (aug.elastic, aug._OP_P * 0.5),   # extra sometimes() wrap, reference :76
])
def test_op_firing_probability(faces64, op, p):
    imgs = np.clip(np.tile(faces64, (16, 1, 1, 1)), 0.05, 0.95)  # 1024
    out = np.asarray(op(jax.random.PRNGKey(3), jnp.asarray(imgs)))
    rate = applied_mask(out, imgs).mean()
    sigma = np.sqrt(p * (1 - p) / len(imgs))
    assert abs(rate - p) <= 5 * sigma + 0.01, (op.__name__, rate, p)


def test_affine_coin_probabilities():
    sx, sy, tx, ty = aug.sample_affine_params(
        jax.random.PRNGKey(4), 4096, use_scale=True, use_shift=True)
    scale_rate = float((np.asarray(sx) != 1.0).mean())
    shift_rate = float((np.asarray(tx) != 0.0).mean())
    assert abs(scale_rate - 0.5) <= 0.05
    assert abs(shift_rate - 0.5) <= 0.05
    assert np.all(np.asarray(sx)[np.asarray(sx) != 1.0] >= 0.8)
    assert np.all(np.asarray(sx)[np.asarray(sx) != 1.0] <= 1.2)
    # shift stored in [-1, 1] grid units = 2 * percent (reference: +-5%)
    assert np.all(np.abs(np.asarray(tx)) <= 0.1 + 1e-6)
