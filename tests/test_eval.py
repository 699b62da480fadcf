"""Eval harness tests: metric math, alignment vs lstsq, backends, nets."""

import numpy as np
import pytest

from latentpose_tpu.eval import metrics


def test_identity_error_perfect_match():
    n, f, d = 4, 3, 8
    gt = np.random.randn(n, d)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True)
    ours = np.broadcast_to(gt[:, None, None], (n, n, f, d)).copy()
    err = metrics.identity_error(gt, ours)
    assert abs(err) < 1e-6


def test_identity_error_excludes_self_driving():
    n, f, d = 3, 2, 4
    gt = np.eye(n, d, dtype=np.float64)
    # reenactments match GT only on the self-driving diagonal
    ours = np.zeros((n, n, f, d))
    for i in range(n):
        ours[i, i] = gt[i]
    err = metrics.identity_error(gt, ours)
    assert abs(err - 1.0) < 1e-9  # diagonal is excluded -> zero similarity


def test_optimal_alignment_matches_lstsq():
    rng = np.random.RandomState(0)
    gt = rng.rand(2, 3, 68, 2) * 200
    our = gt * 0.7 + np.array([5.0, -3.0]) + rng.randn(2, 3, 68, 2)

    # reference-style per-frame lstsq over the (136, 3) design matrix
    def ref_align(x, y):
        lhs = np.zeros((68, 2, 3))
        lhs[:, :, 0] = x
        lhs[:, 0, 1] = 1
        lhs[:, 1, 2] = 1
        sol = np.linalg.lstsq(lhs.reshape(-1, 3), y.reshape(-1),
                              rcond=None)[0]
        return x * sol[0] + sol[1:]

    aligned_ref = np.empty_like(our)
    for i in range(2):
        for j in range(3):
            aligned_ref[i, j] = ref_align(our[i, j], gt[i, j])

    s, t = metrics.optimal_scale_shift(our, gt)
    aligned = our * s + t
    np.testing.assert_allclose(aligned, aligned_ref, rtol=1e-6, atol=1e-6)


def test_pose_error_zero_after_alignment_for_scaled_shifted():
    rng = np.random.RandomState(1)
    gt = rng.rand(1, 2, 68, 2) * 200
    our = gt * 1.3 + np.array([10.0, 20.0])
    err = metrics.pose_reconstruction_error(gt, our,
                                            apply_optimal_alignment=True)
    assert err < 1e-6
    err_raw = metrics.pose_reconstruction_error(gt, our)
    assert err_raw > 0.1


def test_proxy_descriptor_backend_identity_sensitivity():
    from latentpose_tpu.eval.backends import (ProxyDescriptorBackend,
                                              get_default_bbox)
    from latentpose_tpu.data.synthetic import render_face
    backend = ProxyDescriptorBackend()
    bbox = get_default_bbox("latentpose")
    imgs_a = [(render_face(1, f, 256)[0] * 255).astype(np.uint8)
              for f in range(4)]
    imgs_b = [(render_face(2, f, 256)[0] * 255).astype(np.uint8)
              for f in range(4)]
    da, _ = backend(imgs_a, bbox)
    db, _ = backend(imgs_b, bbox)
    same = (da[0] * da[1:]).sum(-1).mean()
    cross = (da[0] * db).sum(-1).mean()
    assert same > cross  # same identity more similar than different


def test_procedural_mean_face_plausible():
    from latentpose_tpu.eval.backends import procedural_mean_face
    mf = procedural_mean_face()
    assert mf.shape == (68, 2)
    assert mf.min() > 0 and mf.max() < 256
    interocular = np.linalg.norm(mf[36] - mf[45])
    assert 30 < interocular < 120


@pytest.mark.slow
def test_arcface_and_fan_shapes():
    import jax
    import jax.numpy as jnp
    from latentpose_tpu.eval.arcface import ArcFaceR100, \
        normalize_embeddings
    from latentpose_tpu.eval.fan import FAN, heatmaps_to_landmarks

    # shrunken variants for CPU: fewer blocks/modules, same code paths
    arc = ArcFaceR100(stage_blocks=(1, 1, 1, 1))
    x = jnp.zeros((1, 112, 112, 3))
    variables = arc.init(jax.random.PRNGKey(0), x)
    emb = normalize_embeddings(arc.apply(variables, x, train=False))
    assert emb.shape == (1, 512)
    np.testing.assert_allclose(float(np.linalg.norm(np.asarray(emb))), 1.0,
                               rtol=1e-5)

    fan = FAN(num_modules=1)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))
    variables = fan.init(jax.random.PRNGKey(2), img)
    heatmaps = fan.apply(variables, img, train=False)
    assert heatmaps[-1].shape == (1, 64, 64, 68)
    lm = heatmaps_to_landmarks(heatmaps[-1])
    assert lm.shape == (1, 68, 2)
    # quarter-pixel refinement can step just past the heatmap edge
    assert float(lm.min()) >= -4 and float(lm.max()) <= 260
