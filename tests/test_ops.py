import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentpose_tpu.ops import (SNConv, SNDense, SNEmbed, adain,
                                crop_and_resize, instance_norm,
                                upsample_nearest_2x, avg_pool_2x)


def test_instance_norm_normalizes():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4)) * 3 + 5
    y = instance_norm(x, eps=1e-4)
    m = np.asarray(jnp.mean(y, axis=(1, 2)))
    v = np.asarray(jnp.var(y, axis=(1, 2)))
    np.testing.assert_allclose(m, 0, atol=1e-4)
    np.testing.assert_allclose(v, 1, atol=1e-2)


def test_adain_applies_per_sample_affine():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    w = jnp.array([[2.0, 1.0, 0.5], [1.0, 3.0, 1.0]])
    b = jnp.array([[1.0, 0.0, -1.0], [0.0, 0.0, 0.0]])
    y = adain(x, w, b)
    yn = instance_norm(x)
    np.testing.assert_allclose(np.asarray(y[0, ..., 0]),
                               np.asarray(yn[0, ..., 0] * 2 + 1), rtol=1e-5)


def test_upsample_and_pool_are_inverse_in_mean():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 2))
    up = upsample_nearest_2x(x)
    assert up.shape == (1, 8, 8, 2)
    down = avg_pool_2x(up)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x), rtol=1e-6)


def test_snconv_unit_spectral_norm():
    """After normalization, the top singular value of the 2-D view is ~1."""
    m = SNConv(8, (3, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    variables = m.init(jax.random.PRNGKey(1), x)
    # run a few updates so power iteration converges
    state = variables
    for _ in range(50):
        _, upd = m.apply(state, x, True, mutable=["spectral"])
        state = {"params": state["params"], "spectral": upd["spectral"]}
    kernel = state["params"]["kernel"]
    u = state["spectral"]["u"]
    v = state["spectral"]["v"]
    w2d = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(8, -1)
    sigma = u @ (w2d @ v)
    true_sigma = np.linalg.svd(np.asarray(w2d), compute_uv=False)[0]
    np.testing.assert_allclose(float(sigma), float(true_sigma), rtol=1e-3)


def test_sn_no_update_when_frozen():
    m = SNDense(4)
    x = jnp.ones((2, 6))
    variables = m.init(jax.random.PRNGKey(0), x)
    y1 = m.apply(variables, x, False)
    y2 = m.apply(variables, x, False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_snembed_lookup_shape():
    m = SNEmbed(10, 16)
    labels = jnp.array([0, 3, 9])
    variables = m.init(jax.random.PRNGKey(0), labels)
    out = m.apply(variables, labels, False)
    assert out.shape == (3, 16)


def test_crop_and_resize_identity_bbox():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    bboxes = jnp.array([[0.0, 16.0, 0.0, 16.0]] * 2)  # t, b, l, r
    y = crop_and_resize(x, bboxes)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_crop_and_resize_center_crop_matches_slice():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))
    # crop [4:12, 4:12] then resize to 8x8 == direct slice
    bboxes = jnp.array([[4.0, 12.0, 4.0, 12.0]])
    y = crop_and_resize(x, bboxes, target_size=(8, 8))
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(x[0, 4:12, 4:12]),
                               atol=1e-5)


def test_upsample2x_conv3x3_exact():
    """Sub-pixel fused upsample+conv == materialized upsample then conv."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from latentpose_tpu.ops.image import (upsample2x_conv3x3,
                                          upsample_nearest_2x)

    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    for c_in, c_out, h in ((8, 16, 5), (16, 8, 8), (3, 3, 7)):
        x = jax.random.normal(k1, (2, h, h, c_in))
        kernel = jax.random.normal(k2, (3, 3, c_in, c_out))
        expected = lax.conv_general_dilated(
            upsample_nearest_2x(x), kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = upsample2x_conv3x3(x, kernel)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)

    # gradients flow identically (used inside the jitted train step)
    def loss_fused(k):
        return jnp.sum(upsample2x_conv3x3(x, k) ** 2)

    def loss_ref(k):
        return jnp.sum(lax.conv_general_dilated(
            upsample_nearest_2x(x), k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2)

    g1 = jax.grad(loss_fused)(kernel)
    g2 = jax.grad(loss_ref)(kernel)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_upsample2x_conv3x3_s2d_and_adain_s2d_exact():
    """s2d-domain up-conv + AdaIN == full-res up-conv + AdaIN, exactly.

    The decoder's up-blocks normalize in the space-to-depth layout before
    the interleave (nn/blocks.py); stats must cover all 4 parity planes.
    """
    import jax
    import jax.numpy as jnp

    from latentpose_tpu.ops.image import (depth_to_space,
                                          upsample2x_conv3x3,
                                          upsample2x_conv3x3_s2d)
    from latentpose_tpu.ops.norms import adain, adain_s2d

    rng = jax.random.PRNGKey(7)
    kx, kk, kw, kb = jax.random.split(rng, 4)
    b, h, c_in, c_out = 3, 6, 8, 16
    x = jax.random.normal(kx, (b, h, h, c_in))
    kernel = jax.random.normal(kk, (3, 3, c_in, c_out)) * 0.1
    w = jax.random.normal(kw, (b, c_out)) + 1.0
    bias = jax.random.normal(kb, (b, c_out)) * 0.1

    full = adain(upsample2x_conv3x3(x, kernel), w, bias)
    s2d = depth_to_space(
        adain_s2d(upsample2x_conv3x3_s2d(x, kernel), w, bias), c_out)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(full),
                               rtol=1e-4, atol=1e-5)

    # channel order of the s2d form is (py, px, c)
    y = upsample2x_conv3x3_s2d(x, kernel)
    y_manual = jnp.transpose(
        upsample2x_conv3x3(x, kernel).reshape(b, h, 2, h, 2, c_out),
        (0, 1, 3, 2, 4, 5)).reshape(b, h, h, 4 * c_out)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_manual),
                               rtol=1e-4, atol=1e-5)
