"""ops/grouped_conv.py: the block-diagonal formulation is exact — same
outputs AND gradients as native feature_group_count conv, same param tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.ops.grouped_conv import (GroupedConv,
                                             expand_blockdiag_kernel)


@pytest.mark.parametrize("cg,groups,stride", [
    (4, 32, 1), (8, 8, 2), (16, 4, 1), (32, 4, 1),  # last: native path
    # coarse block-diagonal path (gc > 1) — the production ResNeXt layer2/3
    # shapes (cg=8/16, groups=32 -> f=16/8, gc=2/4): ADVICE r2 coverage gap
    (8, 32, 1), (16, 32, 2),
])
def test_grouped_conv_matches_nn_conv(cg, groups, stride):
    c_in = cg * groups
    c_out = c_in
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, c_in))

    ours = GroupedConv(c_out, (3, 3), strides=(stride, stride), padding=1,
                       groups=groups)
    theirs = nn.Conv(c_out, (3, 3), strides=(stride, stride), padding=1,
                     feature_group_count=groups, use_bias=False)

    v_ours = ours.init(rng, x)
    v_theirs = theirs.init(rng, x)
    # identical parameter trees (drop-in for checkpoints / conversion)
    assert jax.tree_util.tree_structure(v_ours) == \
        jax.tree_util.tree_structure(v_theirs)
    assert v_ours["params"]["kernel"].shape == \
        v_theirs["params"]["kernel"].shape == (3, 3, cg, c_out)

    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cg, c_out))
    variables = {"params": {"kernel": kernel}}

    y_ours = ours.apply(variables, x)
    y_theirs = theirs.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_theirs),
                               rtol=1e-5, atol=1e-5)

    def loss_ours(k, x):
        return jnp.sum(ours.apply({"params": {"kernel": k}}, x) ** 2)

    def loss_theirs(k, x):
        return jnp.sum(theirs.apply({"params": {"kernel": k}}, x) ** 2)

    gk_o, gx_o = jax.grad(loss_ours, argnums=(0, 1))(kernel, x)
    gk_t, gx_t = jax.grad(loss_theirs, argnums=(0, 1))(kernel, x)
    np.testing.assert_allclose(np.asarray(gk_o), np.asarray(gk_t),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_o), np.asarray(gx_t),
                               rtol=1e-4, atol=1e-4)


def test_expand_blockdiag_structure():
    kernel = jnp.asarray(
        np.random.RandomState(0).randn(3, 3, 2, 8), jnp.float32)
    dense = expand_blockdiag_kernel(kernel, groups=4)
    assert dense.shape == (3, 3, 8, 8)
    d = np.asarray(dense)
    for g_in in range(4):
        for g_out in range(4):
            block = d[:, :, g_in * 2:(g_in + 1) * 2,
                      g_out * 2:(g_out + 1) * 2]
            if g_in == g_out:
                np.testing.assert_array_equal(
                    block, np.asarray(kernel)[:, :, :,
                                              g_out * 2:(g_out + 1) * 2])
            else:
                assert (block == 0).all()


def test_resnext_uses_grouped_conv_and_params_unchanged():
    """The backbone swap keeps the exact torchvision-compatible tree."""
    from latentpose_tpu.nn.backbones import ResNeXt50
    m = ResNeXt50(num_classes=8, layers=(1, 1, 1, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
               train=False)
    k = v["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 4, 128)  # Cg=4 grouped layout preserved
    out = m.apply(v, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 8)
