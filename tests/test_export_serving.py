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
    with pytest.raises(Exception):
        restored.call(bad)
