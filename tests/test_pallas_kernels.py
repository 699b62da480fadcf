"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from latentpose_tpu.ops import norms


def _reference_adain_relu(x, w, b, eps=1e-4, relu=False):
    y = norms.adain(x, w, b, eps)
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("shape", [(2, 8, 8, 128), (1, 16, 8, 256),
                                   (2, 32, 16, 64)])
@pytest.mark.parametrize("relu", [False, True])
def test_adain_fused_matches_xla(shape, relu, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    from latentpose_tpu.ops.pallas import adain_fused as mod

    b, h, w, c = shape
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape) * 3 + 1
    weight = jax.random.normal(jax.random.PRNGKey(1), (b, c))
    bias = jax.random.normal(jax.random.PRNGKey(2), (b, c))

    expected = _reference_adain_relu(x, weight, bias, relu=relu)
    with pltpu.force_tpu_interpret_mode():
        got = mod.adain_fused(x, weight, bias, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("shape,cout", [((2, 8, 8, 256), 128),
                                        ((1, 16, 16, 128), 256)])
def test_bn_relu_conv1x1_stats_matches_xla(shape, cout, relu):
    """Fused BN-apply -> ReLU -> 1x1 conv -> next-BN-stats probe kernel
    (ops/pallas/conv_bn_fused.py) against the unfused XLA math."""
    from jax.experimental.pallas import tpu as pltpu
    from latentpose_tpu.ops.pallas.conv_bn_fused import (
        bn_relu_conv1x1_stats, fold_bn)

    cin = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(0), shape) * 2 + 0.5
    w = jax.random.normal(jax.random.PRNGKey(1), (cin, cout)) * 0.06
    mean = jnp.full((cin,), 0.5)
    var = jnp.full((cin,), 4.0)
    gamma = jnp.full((cin,), 1.1)
    beta = jnp.full((cin,), 0.1)
    scale, offset = fold_bn(mean, var, gamma, beta)

    h = (x - mean) * gamma * jax.lax.rsqrt(var + 1e-5) + beta
    if relu:
        h = jnp.maximum(h, 0.0)
    ref = jnp.einsum("bhwc,cd->bhwd", h, w)
    ref_stats = jnp.stack([ref.sum((0, 1, 2)), (ref * ref).sum((0, 1, 2))])

    with pltpu.force_tpu_interpret_mode():
        y, stats = bn_relu_conv1x1_stats(x, scale, offset, w, relu=relu,
                                         m_tile=32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(ref_stats),
                               rtol=2e-4, atol=2e-4)
