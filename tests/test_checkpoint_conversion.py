"""Structural validation of the reference-checkpoint converter: fabricate
state dicts with the reference's exact key layout/shapes, convert, and run
our models with the converted parameters."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def _sn_conv_sd(sd, prefix, out_ch, in_ch, k, bias=True):
    rng = np.random.RandomState(abs(hash(prefix)) % 2**31)
    w = rng.randn(out_ch, in_ch, k, k).astype(np.float32) * 0.05
    sd[prefix + ".weight_orig"] = w
    u = rng.randn(out_ch).astype(np.float32)
    sd[prefix + ".weight_u"] = u / np.linalg.norm(u)
    if bias:
        sd[prefix + ".bias"] = rng.randn(out_ch).astype(np.float32) * 0.01


def _sn_dense_sd(sd, prefix, out_f, in_f, bias=True):
    rng = np.random.RandomState(abs(hash(prefix)) % 2**31)
    w = rng.randn(out_f, in_f).astype(np.float32) * 0.05
    sd[prefix + ".weight_orig"] = w
    u = rng.randn(out_f).astype(np.float32)
    sd[prefix + ".weight_u"] = u / np.linalg.norm(u)
    if bias:
        sd[prefix + ".bias"] = rng.randn(out_f).astype(np.float32) * 0.01


def _resblock_sd(sd, prefix, in_ch, out_ch, normalize, upsample):
    # torch layer indices (zero padding): see tools/convert_torch_weights
    idx = (1 if normalize else 0) + 1 + (1 if upsample else 0) + 1
    _sn_conv_sd(sd, f"{prefix}.block.{idx}", out_ch, in_ch, 3,
                bias=not normalize)
    idx += 1 + (1 if normalize else 0) + 1 + 1
    _sn_conv_sd(sd, f"{prefix}.block.{idx}", out_ch, out_ch, 3,
                bias=not normalize)
    if in_ch != out_ch or upsample:
        _sn_conv_sd(sd, f"{prefix}.skip.{1 if upsample else 0}",
                    out_ch, in_ch, 1, bias=True)


GEN_KW = dict(num_channels=8, max_num_channels=32,
              identity_embedding_size=16, pose_embedding_size=8,
              output_image_size=32, num_residual_blocks=2)


def fabricate_generator_sd():
    """Reference flagship generator at image 32, channels 8/32: 2 res
    blocks @32ch + 3 up blocks (32->32, 32->16, 16->8), head conv 8->4."""
    sd = {}
    sd["constant.constant"] = np.random.RandomState(0).randn(
        1, 32, 4, 4).astype(np.float32)
    chans = [(32, 32, False), (32, 32, False), (32, 32, True),
             (32, 16, True), (16, 8, True)]
    for i, (ic, oc, up) in enumerate(chans):
        _resblock_sd(sd, f"decoder_blocks.{i}", ic, oc, True, up)
    _sn_conv_sd(sd, "decoder_blocks.7", 4, 8, 3, bias=True)  # head
    num_affine = 2 * (32 + 32 + 32 + 32 + 32 + 32 + 32 + 16 + 16 + 8 + 8)
    _sn_dense_sd(sd, "affine_params_projector.0", 512, 24)
    _sn_dense_sd(sd, "affine_params_projector.2", num_affine, 512)
    return sd


def test_generator_conversion_structure():
    from convert_torch_weights import convert_flagship_generator
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)

    sd = fabricate_generator_sd()
    params, spectral, extra = convert_flagship_generator(
        sd, num_blocks=5, num_residual=2)
    assert extra == {}

    m = gen_mod.Generator(**GEN_KW)
    inputs = {"embeds": jnp.ones((2, 16)) * 0.1,
              "pose_embedding": jnp.ones((2, 8)) * 0.1}
    # converted trees must be directly consumable by our module
    init_vars = m.init(jax.random.PRNGKey(0), inputs)

    def shapes(tree):
        return {jax.tree_util.keystr(p): np.shape(leaf) for p, leaf in
                jax.tree_util.tree_leaves_with_path(tree)}

    assert shapes(init_vars["params"]) == shapes(params)

    rgbs, segm = m.apply({"params": params, "spectral": spectral}, inputs)
    assert rgbs.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(rgbs)).all()


def test_discriminator_conversion_structure():
    from convert_torch_weights import convert_flagship_discriminator
    from latentpose_tpu.models.discriminators import no_landmarks as dis_mod

    sd = {}
    _sn_conv_sd(sd, "down_block.0", 8, 3, 3)
    _sn_conv_sd(sd, "down_block.2", 8, 8, 3)
    _sn_conv_sd(sd, "skip.0", 8, 3, 1)
    # image 32, dis_num_blocks=4 -> plan: 2 down (8->16, 16->32), 1 res (32)
    plan = [(8, 16, True), (16, 32, True), (32, 32, False)]
    for i, (ic, oc, down) in enumerate(plan):
        _resblock_sd(sd, f"blocks.{i}", ic, oc, False, False)
        if down:
            # mark downsample: pool sits at block index 5 for no-norm blocks
            pass
    _sn_dense_sd(sd, "linear", 1, 32)
    rng = np.random.RandomState(9)
    w = rng.uniform(-0.1, 0.1, (5, 32)).astype(np.float32)
    sd["embed.weight_orig"] = w
    u = rng.randn(5).astype(np.float32)
    sd["embed.weight_u"] = u / np.linalg.norm(u)

    params, spectral = convert_flagship_discriminator(sd, num_blocks=3)
    m = dis_mod.Discriminator(num_channels=8, max_num_channels=32,
                              embed_channels=32, num_blocks=4,
                              image_size=32, num_labels=5)
    x = jnp.ones((2, 32, 32, 3)) * 0.5
    labels = jnp.array([0, 3])
    init_vars = m.init(jax.random.PRNGKey(0), x, labels)
    for key in init_vars["params"]:
        assert key in params, f"missing converted subtree {key}"
    score, feats = m.apply({"params": params, "spectral": spectral}, x,
                           labels)
    assert score.shape == (2,)
    assert np.isfinite(np.asarray(score)).all()
