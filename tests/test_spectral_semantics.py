"""Spectral-norm power-iteration semantics parity: one train step must
advance the discriminator's (u, v) exactly THREE times (the reference's
fake-G / fake-D / real forwards — discriminators/no_landmarks.py:154-161 +
torch's per-forward hook) and the generator's exactly ONCE."""

import types

import numpy as np
import jax
import jax.numpy as jnp

from latentpose_tpu.losses import adversarial, dice, featmat
from latentpose_tpu.models.discriminators import no_landmarks as dis_mod
from latentpose_tpu.models.embedders import simple_conv as emb_mod
from latentpose_tpu.models.generators import (
    vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)
from latentpose_tpu.runners import build, holycow
from latentpose_tpu.data.synthetic import SyntheticDataLoader


def _l2n(x, eps=1e-4):
    return x / max(np.linalg.norm(x), eps)


def manual_power_iterations(kernel_hwio, u0, n):
    """n torch-style PI steps on the (O, I*H*W) view of an HWIO kernel."""
    w2d = np.transpose(np.asarray(kernel_hwio), (3, 2, 0, 1))
    w2d = w2d.reshape(w2d.shape[0], -1)
    u = np.asarray(u0)
    for _ in range(n):
        v = _l2n(w2d.T @ u)
        u = _l2n(w2d @ v)
    return u, v


def test_pi_counts_per_step():
    args = types.SimpleNamespace(
        image_size=16, in_channels=3, out_channels=3, num_channels=4,
        max_num_channels=16, embed_channels=16, pose_embedding_size=8,
        gen_padding="zero", gen_constant_input_size=4,
        gen_num_residual_blocks=1, norm_layer="in", dis_padding="zero",
        dis_num_blocks=3, num_labels=4, optimizer="Adam", lr_gen=1e-3,
        lr_dis=1e-3, beta1=0.0, average_function="sum", finetune=False,
        iteration=0, set_eval_mode_in_train=False, batch_size=2,
        random_seed=0, gan_type="gan", fm_weight=10.0, dice_weight=1.0,
        use_pixelwise_augs=False, use_affine_scale=False,
        use_affine_shift=False)
    models = {
        "embedder": emb_mod.Embedder(identity_embedding_size=16,
                                     pose_embedding_size=8, width=4),
        "generator": gen_mod.Generator(
            num_channels=4, max_num_channels=16, identity_embedding_size=16,
            pose_embedding_size=8, output_image_size=16,
            num_residual_blocks=1),
        "discriminator": dis_mod.Discriminator(
            num_channels=4, max_num_channels=16, embed_channels=16,
            num_blocks=3, image_size=16, num_labels=4),
    }
    criteria = [adversarial.Criterion("gan"), featmat.Criterion(10.0),
                dice.Criterion(1.0)]
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": dis_mod})
    state = build.init_train_state(args, models, opt_g, opt_d,
                                   jax.random.PRNGKey(0))
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)

    loader = SyntheticDataLoader(16, 2, num_labels=4, num_enc_frames=2)
    data, target = loader.get_batch(0)
    new_state, _ = step_fn(state, {**data, **target}, jax.random.PRNGKey(1))

    # discriminator trunk conv: u advanced exactly 3 PI steps on the
    # PRE-update kernel
    kernel = state.params["discriminator"]["stem_conv0"]["kernel"]
    u0 = state.spectral["discriminator"]["stem_conv0"]["u"]
    expect_u3, expect_v3 = manual_power_iterations(kernel, u0, 3)
    got_u = np.asarray(new_state.spectral["discriminator"]["stem_conv0"]["u"])
    np.testing.assert_allclose(got_u, expect_u3, rtol=1e-4, atol=1e-5)

    # ...and NOT 1 or 2 steps (sanity that the assertion discriminates)
    expect_u1, _ = manual_power_iterations(kernel, u0, 1)
    assert np.abs(got_u - expect_u1).max() > 1e-4

    # generator conv: exactly 1 PI step (one forward per train step)
    g_kernel = state.params["generator"]["head_conv"]["kernel"]
    g_u0 = state.spectral["generator"]["head_conv"]["u"]
    g_expect, _ = manual_power_iterations(g_kernel, g_u0, 1)
    got_g = np.asarray(new_state.spectral["generator"]["head_conv"]["u"])
    np.testing.assert_allclose(got_g, g_expect, rtol=1e-4, atol=1e-5)
