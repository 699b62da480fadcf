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
