"""Serving export (cli/export.py): the drive step lowered to a
self-contained StableHLO artifact must reproduce make_drive_fn exactly
after a serialize -> deserialize roundtrip."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentpose_tpu.models.discriminators import no_landmarks as dis_mod
from latentpose_tpu.models.embedders import simple_conv as emb_mod
from latentpose_tpu.models.generators import (
    vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)
from latentpose_tpu.runners import build
from latentpose_tpu.runners import drive as drive_lib

IMG = 16
BATCH = 2


def tiny_args(**over):
    args = types.SimpleNamespace(
        image_size=IMG, in_channels=3, out_channels=3, num_channels=4,
        max_num_channels=16, embed_channels=16, pose_embedding_size=8,
        gen_padding="zero", gen_constant_input_size=4,
        gen_num_residual_blocks=1, norm_layer="in",
        dis_padding="zero", dis_num_blocks=3, num_labels=4,
        optimizer="Adam", lr_gen=1e-3, lr_dis=1e-3, beta1=0.0,
        average_function="sum", finetune=True, iteration=0,
        set_eval_mode_in_train=False, batch_size=BATCH, random_seed=0,
        compute_dtype="float32",
    )
    for k, v in over.items():
        setattr(args, k, v)
    return args


def tiny_models(args):
    return {
        "embedder": emb_mod.Embedder(
            identity_embedding_size=args.embed_channels,
            pose_embedding_size=args.pose_embedding_size, width=4),
        "generator": gen_mod.Generator(
            num_channels=args.num_channels,
            max_num_channels=args.max_num_channels,
            identity_embedding_size=args.embed_channels,
            pose_embedding_size=args.pose_embedding_size,
            output_image_size=args.image_size,
            num_residual_blocks=args.gen_num_residual_blocks),
        "discriminator": dis_mod.Discriminator(
            num_channels=args.num_channels,
            max_num_channels=args.max_num_channels,
            embed_channels=args.embed_channels,
            num_blocks=args.dis_num_blocks, image_size=args.image_size,
            num_labels=args.num_labels),
    }


@pytest.fixture(scope="module")
def setup_finetuned():
    args = tiny_args()
    models = tiny_models(args)
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": dis_mod})
    state = build.init_train_state(args, models, opt_g, opt_d,
                                   jax.random.PRNGKey(0), finetune=True)
    return args, models, state


@pytest.mark.parametrize("wire_dtype", [jnp.uint8, jnp.float32])
def test_export_roundtrip_matches_drive_fn(setup_finetuned, wire_dtype):
    from latentpose_tpu.cli.export import export_serving_artifact

    args, models, state = setup_finetuned
    rng = np.random.RandomState(0)
    if wire_dtype == jnp.uint8:
        frames = rng.randint(0, 256, (BATCH, IMG, IMG, 3)).astype(np.uint8)
    else:
        frames = rng.rand(BATCH, IMG, IMG, 3).astype(np.float32)

    drive_fn = drive_lib.make_drive_fn(models, args, use_ema=True)
    want_rgbs, want_segm = drive_fn(state, frames)

    blob, exported = export_serving_artifact(
        models, state, args, BATCH, wire_dtype)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0

    restored = jax.export.deserialize(bytearray(blob))
    got_rgbs, got_segm = restored.call(frames)
    np.testing.assert_allclose(np.asarray(got_rgbs),
                               np.asarray(want_rgbs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_segm),
                               np.asarray(want_segm), atol=1e-4)


def test_export_rejects_wrong_shape(setup_finetuned):
    from latentpose_tpu.cli.export import export_serving_artifact

    args, models, state = setup_finetuned
    blob, _ = export_serving_artifact(models, state, args, BATCH, jnp.uint8)
    restored = jax.export.deserialize(bytearray(blob))
    bad = np.zeros((BATCH + 1, IMG, IMG, 3), np.uint8)
    # jax.export raises a shape-assertion ValueError on input mismatch;
    # matching it specifically keeps this test from passing on unrelated
    # plumbing failures (ADVICE r4)
    with pytest.raises(ValueError, match="[Ss]hape"):
        restored.call(bad)


def test_export_explicit_platform_lowering(setup_finetuned):
    """--platforms with an explicit list must be honored by the exported
    module and still roundtrip numerically (ADVICE r4: the multi-platform
    path had no coverage and is the likeliest to break across jax
    upgrades)."""
    from latentpose_tpu.cli.export import export_serving_artifact

    args, models, state = setup_finetuned
    rng = np.random.RandomState(1)
    frames = rng.rand(BATCH, IMG, IMG, 3).astype(np.float32)

    drive_fn = drive_lib.make_drive_fn(models, args, use_ema=True)
    want_rgbs, want_segm = drive_fn(state, frames)

    blob, exported = export_serving_artifact(
        models, state, args, BATCH, jnp.float32, platforms=["cpu"])
    assert list(exported.platforms) == ["cpu"]

    restored = jax.export.deserialize(bytearray(blob))
    assert list(restored.platforms) == ["cpu"]
    got_rgbs, got_segm = restored.call(frames)
    np.testing.assert_allclose(np.asarray(got_rgbs),
                               np.asarray(want_rgbs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_segm),
                               np.asarray(want_segm), atol=1e-4)


def test_export_int8_static_bakes_calibrated_scales(setup_finetuned):
    """--quantize int8_static export: calibrate on frames via
    calibrate_quant_scales (the production path), bake the scales into the
    artifact, and stay within the int8 tolerance of the float output."""
    from latentpose_tpu.cli.export import export_serving_artifact

    args, models, state = setup_finetuned
    args_d = tiny_args(quantize="int8")
    args_s = tiny_args(quantize="int8_static")

    def gen_for(a):
        return gen_mod.Generator(
            num_channels=a.num_channels,
            max_num_channels=a.max_num_channels,
            identity_embedding_size=a.embed_channels,
            pose_embedding_size=a.pose_embedding_size,
            output_image_size=a.image_size,
            num_residual_blocks=a.gen_num_residual_blocks,
            quantize=True,
            quant_static=a.quantize == "int8_static")

    models_dyn = {**models, "generator": gen_for(args_d)}
    models_st = {**models, "generator": gen_for(args_s)}

    rng = np.random.RandomState(4)
    frames = rng.rand(BATCH * 2, IMG, IMG, 3).astype(np.float32)
    calib = drive_lib.calibrate_quant_scales(
        models_dyn, args_d, state, frames, batch_size=BATCH)
    assert jax.tree_util.tree_leaves(calib), "calibration found no convs"

    blob, _ = export_serving_artifact(
        models_st, state, args_s, BATCH, jnp.float32, quant_calib=calib)
    restored = jax.export.deserialize(bytearray(blob))

    drive_fn = drive_lib.make_drive_fn(models, args, use_ema=True)
    want_rgbs, _ = drive_fn(state, frames[:BATCH])
    got_rgbs, _ = restored.call(frames[:BATCH])
    err = np.abs(np.asarray(got_rgbs, np.float32)
                 - np.asarray(want_rgbs, np.float32))
    assert float(err.mean()) < 0.05, (
        f"int8_static export drifted: mean|err|={err.mean():.4f}")


def test_export_int8_quantized_models(setup_finetuned):
    """--quantize int8 export: the artifact built from int8-decoder models
    roundtrips and stays within the established int8-vs-float tolerance
    (same bar as tests/test_quantize.py / the 40 dB drive gate)."""
    from latentpose_tpu.cli.export import export_serving_artifact

    args, models, state = setup_finetuned
    args_q = tiny_args(quantize="int8")
    models_q = dict(models)
    models_q["generator"] = gen_mod.Generator(
        num_channels=args_q.num_channels,
        max_num_channels=args_q.max_num_channels,
        identity_embedding_size=args_q.embed_channels,
        pose_embedding_size=args_q.pose_embedding_size,
        output_image_size=args_q.image_size,
        num_residual_blocks=args_q.gen_num_residual_blocks,
        quantize=True)

    rng = np.random.RandomState(2)
    frames = rng.rand(BATCH, IMG, IMG, 3).astype(np.float32)

    # float reference output from the same weights
    drive_fn = drive_lib.make_drive_fn(models, args, use_ema=True)
    want_rgbs, _ = drive_fn(state, frames)

    blob, _ = export_serving_artifact(
        models_q, state, args_q, BATCH, jnp.float32)
    restored = jax.export.deserialize(bytearray(blob))
    got_rgbs, got_segm = restored.call(frames)
    assert np.asarray(got_segm).shape == (BATCH, IMG, IMG, 1)
    err = np.abs(np.asarray(got_rgbs, np.float32)
                 - np.asarray(want_rgbs, np.float32))
    assert float(err.mean()) < 0.05, (
        f"int8 export drifted from float: mean|err|={err.mean():.4f}")
