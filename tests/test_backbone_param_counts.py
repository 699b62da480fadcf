"""Structural parity via exact parameter counts.

torchvision's resnext50_32x4d has 25,028,904 params (1000-class fc) and
mobilenet_v2 has 3,504,872 — adjusting only the final classifier to the
flagship's 512/256 outputs gives the expected totals below.  Matching them
exactly means every conv/BN/fc shape in our ports agrees with torchvision,
which is what the checkpoint converter depends on."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def count_params(tree):
    return sum(int(np.prod(np.shape(x)))
               for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.slow
def test_resnext50_param_count():
    from latentpose_tpu.nn.backbones import ResNeXt50
    m = ResNeXt50(num_classes=512)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    expected = 25_028_904 - (2048 * 1000 + 1000) + (2048 * 512 + 512)
    assert count_params(variables["params"]) == expected
    # running stats are buffers, not params (torch parity)
    assert count_params(variables["batch_stats"]) > 0


@pytest.mark.slow
def test_mobilenet_v2_param_count():
    from latentpose_tpu.nn.backbones import MobileNetV2
    m = MobileNetV2(num_classes=256)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    expected = 3_504_872 - (1280 * 1000 + 1000) + (1280 * 256 + 256)
    assert count_params(variables["params"]) == expected
