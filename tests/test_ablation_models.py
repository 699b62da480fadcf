"""Tests for the ablation families: FSTH embedder/generator/discriminator,
FSTH_plus, no_pose embedder, none discriminator — including a full FSTH
train step and the affine-params fine-tune path."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentpose_tpu.losses import adversarial, featmat, l1_rgb
from latentpose_tpu.models.discriminators import FSTH as fsth_dis
from latentpose_tpu.models.discriminators import none as none_dis
from latentpose_tpu.models.embedders import FSTH as fsth_emb
from latentpose_tpu.models.embedders import no_pose_encoder
from latentpose_tpu.models.generators import FSTH as fsth_gen
from latentpose_tpu.models.generators import FSTH_plus as fsth_plus_gen
from latentpose_tpu.runners import build, holycow
from latentpose_tpu.runners.state import TrainState, d_trainable, g_trainable

IMG = 16
B = 2
EMB = 16


def test_fsth_embedder_shapes():
    m = fsth_emb.Embedder(num_channels=4, max_num_channels=16,
                          embed_channels=EMB, num_blocks=3)
    enc = jnp.zeros((B, 3, IMG, IMG, 3))
    stick = jnp.zeros((B, 3, IMG, IMG, 3))
    variables = m.init(jax.random.PRNGKey(0), enc, None, stick)
    (embeds, elemwise, pose), _ = m.apply(variables, enc, None, stick,
                                          mutable=["spectral"])
    assert embeds.shape == (B, EMB)
    assert elemwise.shape == (B, 3, EMB)
    assert pose is None


def test_no_pose_embedder_rgb_only():
    m = no_pose_encoder.Embedder(num_channels=4, max_num_channels=16,
                                 embed_channels=EMB, num_blocks=3)
    enc = jnp.zeros((B, 2, IMG, IMG, 3))
    variables = m.init(jax.random.PRNGKey(0), enc)
    (embeds, elemwise, pose), _ = m.apply(variables, enc,
                                          mutable=["spectral"])
    assert embeds.shape == (B, EMB)
    assert pose is None


@pytest.fixture(scope="module")
def fsth_generator():
    m = fsth_gen.Generator(num_channels=4, max_num_channels=16,
                           embed_channels=EMB, num_downsample_blocks=2,
                           num_residual_blocks=1)
    inputs = {"embeds": jnp.zeros((B, EMB)),
              "dec_stickmen": jnp.zeros((B, 1, IMG, IMG, 3))}
    variables = m.init(jax.random.PRNGKey(0), inputs)
    return m, variables, inputs


def test_fsth_generator_shapes(fsth_generator):
    m, variables, inputs = fsth_generator
    rgbs, segm = m.apply(variables, inputs)
    assert rgbs.shape == (B, IMG, IMG, 3)
    assert segm is None
    assert float(rgbs.min()) >= -1.0 and float(rgbs.max()) <= 1.0


def test_fsth_finetune_affine_override(fsth_generator):
    """finetune_affine must override the projected embedding path."""
    m, variables, inputs = fsth_generator
    affine = m.apply(variables, jnp.ones((1, EMB)), method="project_embeds")
    assert affine.shape == (1, m.num_affine_params())
    out_emb, _ = m.apply(variables, {**inputs,
                                     "embeds": jnp.ones((B, EMB))})
    out_aff, _ = m.apply(variables, {
        "dec_stickmen": inputs["dec_stickmen"],
        "finetune_affine": jnp.broadcast_to(affine, (B,) + affine.shape[1:])})
    np.testing.assert_allclose(np.asarray(out_emb), np.asarray(out_aff),
                               atol=1e-5)
    # different affine -> different output
    out_aff2, _ = m.apply(variables, {
        "dec_stickmen": inputs["dec_stickmen"],
        "finetune_affine": jnp.broadcast_to(affine * 2.0,
                                            (B,) + affine.shape[1:])})
    assert float(jnp.abs(out_aff2 - out_aff).max()) > 1e-5


def test_fsth_plus_generator_shapes():
    m = fsth_plus_gen.Generator(num_channels=4, max_num_channels=16,
                                identity_embedding_size=EMB,
                                pose_embedding_size=136,
                                output_image_size=IMG,
                                num_residual_blocks=1)
    inputs = {"embeds": jnp.zeros((B, EMB)),
              "dec_keypoints": jnp.zeros((B, 1, 136))}
    variables = m.init(jax.random.PRNGKey(0), inputs)
    rgbs, segm = m.apply(variables, inputs)
    assert rgbs.shape == (B, IMG, IMG, 3)
    assert segm.shape == (B, IMG, IMG, 1)


def test_none_discriminator():
    m = none_dis.Discriminator()
    x = jnp.zeros((B, IMG, IMG, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    score, feats = m.apply(variables, x)
    assert score.shape == (B,)
    assert feats == []


def fsth_args():
    return types.SimpleNamespace(
        image_size=IMG, in_channels=3, out_channels=3, num_channels=4,
        max_num_channels=16, embed_channels=EMB, pose_embedding_size=136,
        gen_padding="zero", gen_num_downsample_blocks=2,
        gen_num_residual_blocks=1, norm_layer="in", dis_padding="zero",
        dis_num_blocks=3, num_labels=4, optimizer="Adam", lr_gen=1e-3,
        lr_dis=1e-3, beta1=0.0, average_function="sum", finetune=False,
        iteration=0, set_eval_mode_in_train=False, batch_size=B,
        random_seed=0, gan_type="gan", fm_weight=10.0, l1_weight=30.0,
        embed_padding="zero", embed_num_blocks=3,
        use_pixelwise_augs=False, use_affine_scale=False,
        use_affine_shift=False)


def fsth_batch(rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    return {
        "enc_rgbs": rng.rand(B, 2, IMG, IMG, 3).astype(np.float32),
        "enc_stickmen": rng.rand(B, 2, IMG, IMG, 3).astype(np.float32),
        "pose_input_rgbs": rng.rand(B, 1, IMG, IMG, 3).astype(np.float32),
        "dec_stickmen": rng.rand(B, 1, IMG, IMG, 3).astype(np.float32),
        "dec_keypoints": rng.rand(B, 1, 136).astype(np.float32),
        "target_rgbs": rng.rand(B, 1, IMG, IMG, 3).astype(np.float32),
        "label": np.array([0, 1], np.int32),
    }


def test_fsth_full_train_step():
    args = fsth_args()
    models = {
        "embedder": fsth_emb.Wrapper.get_net(args),
        "generator": fsth_gen.Wrapper.get_net(args),
        "discriminator": fsth_dis.Wrapper.get_net(args),
    }
    criteria = [adversarial.Criterion("gan"),
                featmat.Criterion(args.fm_weight),
                l1_rgb.Criterion(args.l1_weight)]
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": fsth_dis})
    state = build.init_train_state(args, models, opt_g, opt_d,
                                   jax.random.PRNGKey(0))
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)
    new_state, scalars = step_fn(state, fsth_batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(scalars["loss_G"]))
    assert np.isfinite(float(scalars["loss_D"]))
    assert int(new_state.step) == 1


def test_fsth_finetune_train_step():
    """FSTH fine-tuning trains the packed AdaIN params (finetune_affine)."""
    from latentpose_tpu.runners import finetune as ft
    args = fsth_args()
    models = {
        "embedder": fsth_emb.Wrapper.get_net(args),
        "generator": fsth_gen.Wrapper.get_net(args),
        "discriminator": fsth_dis.Wrapper.get_net(args),
    }
    criteria = [adversarial.Criterion("gan"),
                featmat.Criterion(args.fm_weight),
                l1_rgb.Criterion(args.l1_weight)]
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": fsth_dis})
    state = build.init_train_state(args, models, opt_g, opt_d,
                                   jax.random.PRNGKey(0))

    e_hat = jnp.ones((1, EMB)) * 0.1
    args.finetune = True
    models, state = ft.enable_finetuning(
        state, models, fsth_dis.Wrapper, args, e_hat, opt_g, opt_d,
        jax.random.PRNGKey(2), gen_wrapper=fsth_gen.Wrapper)
    assert "finetune_affine" in state.params
    assert state.params["finetune_affine"].shape == (
        1, models["generator"].num_affine_params())

    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)
    batch = fsth_batch()
    batch["label"] = np.zeros((B,), np.int32)
    new_state, scalars = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(scalars["loss_G"]))
    moved = jnp.abs(new_state.params["finetune_affine"]
                    - state.params["finetune_affine"]).max()
    assert float(moved) > 0
