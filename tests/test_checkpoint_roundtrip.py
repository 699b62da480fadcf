"""Checkpoint roundtrip: every leaf of the TrainState (params, both opt
states, EMA, BN stats, spectral (u, v), step) must restore bit-exactly;
plus experiment auto-naming and collision suffixing."""

import types

import numpy as np
import pytest
import jax

from latentpose_tpu import checkpoint as ckpt_lib


def tiny_state():
    from latentpose_tpu.losses import adversarial, dice, featmat
    from latentpose_tpu.models.discriminators import no_landmarks as dis_mod
    from latentpose_tpu.models.embedders import simple_conv as emb_mod
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)
    from latentpose_tpu.runners import build, holycow
    from latentpose_tpu.data.synthetic import SyntheticDataLoader

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
    # take 2 real steps so opt/EMA/spectral states are all non-trivial
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)
    loader = SyntheticDataLoader(16, 2, num_labels=4, num_enc_frames=2)
    for i in range(2):
        data, target = loader.get_batch(i)
        state, _ = step_fn(state, {**data, **target},
                           jax.random.PRNGKey(i))
    return args, models, opt_g, opt_d, state


def test_checkpoint_bit_exact_roundtrip(tmp_path):
    from latentpose_tpu.runners import build
    args, models, opt_g, opt_d, state = tiny_state()

    path = ckpt_lib.save_checkpoint(tmp_path, state, args)
    assert path is not None and path.name == "model_00000002.ckpt"

    skeleton = build.init_train_state(args, models, opt_g, opt_d,
                                      jax.random.PRNGKey(123))
    restored = ckpt_lib.restore_state(path, skeleton)

    assert int(restored.step) == int(state.step) == 2
    flat_a = jax.tree_util.tree_leaves_with_path(
        (state.params, state.opt_state_g, state.opt_state_d,
         state.ema_params, state.batch_stats, state.spectral))
    flat_b = jax.tree_util.tree_leaves_with_path(
        (restored.params, restored.opt_state_g, restored.opt_state_d,
         restored.ema_params, restored.batch_stats, restored.spectral))
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))

    # collision suffixing (reference utils/utils.py:277-284)
    path2 = ckpt_lib.save_checkpoint(tmp_path, state, args)
    assert path2.name == "model_00000002.ckpt_0"

    # peek_args round-trips the namespace (resolution level 2)
    peeked = ckpt_lib.peek_args(path)
    assert peeked["batch_size"] == 2
    assert peeked["iteration"] == 2


def test_experiment_auto_naming():
    from latentpose_tpu.utils.logging_writer import get_experiment_name

    defaults = types.SimpleNamespace(batch_size=8, lr_gen=5e-5, rank=0)
    args = types.SimpleNamespace(experiment_name="", batch_size=16,
                                 lr_gen=5e-5, rank=3)
    name = get_experiment_name(args, defaults, args_to_ignore=["rank"])
    assert "batch_size^16" in name       # non-default arg in the name
    assert "lr_gen" not in name          # default value excluded
    assert "rank" not in name            # ignored arg excluded

    named = types.SimpleNamespace(experiment_name="myexp")
    assert get_experiment_name(named, defaults, []) == "myexp"
