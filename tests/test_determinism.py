"""Determinism (SURVEY.md §4 test strategy): fixed PRNG keys + fixed data ->
bit-identical training trajectories."""

import numpy as np
import jax


def test_train_step_deterministic():
    import types
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
        use_pixelwise_augs=True, use_affine_scale=True,
        use_affine_shift=True)

    def run():
        models = {
            "embedder": emb_mod.Embedder(identity_embedding_size=16,
                                         pose_embedding_size=8, width=4),
            "generator": gen_mod.Generator(
                num_channels=4, max_num_channels=16,
                identity_embedding_size=16, pose_embedding_size=8,
                output_image_size=16, num_residual_blocks=1),
            "discriminator": dis_mod.Discriminator(
                num_channels=4, max_num_channels=16, embed_channels=16,
                num_blocks=3, image_size=16, num_labels=4),
        }
        criteria = [adversarial.Criterion("gan"), featmat.Criterion(10.0),
                    dice.Criterion(1.0)]
        opt_g, opt_d = build.build_optimizers(
            args, {"discriminators": dis_mod})
        state = build.init_train_state(args, models, opt_g, opt_d,
                                       jax.random.PRNGKey(0))
        step_fn = holycow.make_train_step(models, criteria, args, opt_g,
                                          opt_d)
        loader = SyntheticDataLoader(16, 2, num_labels=4, num_enc_frames=2)
        trajectory = []
        for i in range(3):
            data, target = loader.get_batch(i)
            state, scalars = step_fn(state, {**data, **target},
                                     jax.random.fold_in(
                                         jax.random.PRNGKey(9), i))
            trajectory.append(float(scalars["loss_G"]))
        return trajectory, state

    traj1, s1 = run()
    traj2, s2 = run()
    np.testing.assert_array_equal(traj1, traj2)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
