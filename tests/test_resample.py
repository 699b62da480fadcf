"""Separable resampler must match the gather-based grid_sample exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from latentpose_tpu.ops import image as image_ops
from latentpose_tpu.ops import resample


def test_crop_and_resize_matches_gather_version():
    x = jax.random.uniform(jax.random.PRNGKey(0), (3, 24, 24, 3))
    bboxes = jnp.array([[2.0, 20.0, 3.0, 21.0],
                        [-4.0, 28.0, -2.0, 26.0],   # out of bounds
                        [0.0, 24.0, 0.0, 24.0]])    # identity
    ref = image_ops.crop_and_resize(x, bboxes, target_size=(16, 16))
    got = resample.crop_and_resize(x, bboxes, target_size=(16, 16))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_affine_resample_matches_grid_sample():
    from latentpose_tpu.data.augmentation import apply_affine
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3))
    sx = jnp.array([1.0, 0.9, 1.15, 1.0])
    sy = jnp.array([1.0, 1.1, 0.85, 1.0])
    tx = jnp.array([0.0, 0.04, -0.06, 0.1])
    ty = jnp.array([0.0, -0.03, 0.08, 0.0])
    ref = apply_affine(x, sx, sy, tx, ty, separable=False)
    got = resample.affine_resample(x, sx, sy, tx, ty)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_resample_differentiable():
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 1))

    def loss(img):
        bboxes = jnp.array([[1.0, 7.0, 1.0, 7.0]])
        return resample.crop_and_resize(img, bboxes,
                                        target_size=(4, 4)).sum()

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert float(jnp.abs(g).sum()) > 0
