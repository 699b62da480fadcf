"""End-to-end train-step tests at tiny sizes (CPU, hermetic)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentpose_tpu.losses import adversarial, dice, featmat, l1_rgb
from latentpose_tpu.models.discriminators import no_landmarks as dis_mod
from latentpose_tpu.models.embedders import simple_conv as emb_mod
from latentpose_tpu.models.generators import (
    vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)
from latentpose_tpu.runners import build, holycow
from latentpose_tpu.runners.state import g_trainable
from latentpose_tpu.data.synthetic import SyntheticDataLoader

IMG = 16


def tiny_args(**over):
    args = types.SimpleNamespace(
        image_size=IMG, in_channels=3, out_channels=3, num_channels=4,
        max_num_channels=16, embed_channels=16, pose_embedding_size=8,
        gen_padding="zero", gen_constant_input_size=4,
        gen_num_residual_blocks=1, norm_layer="in",
        dis_padding="zero", dis_num_blocks=3, num_labels=4,
        optimizer="Adam", lr_gen=1e-3, lr_dis=1e-3, beta1=0.0,
        average_function="sum", finetune=False, iteration=0,
        set_eval_mode_in_train=False, batch_size=2, random_seed=0,
        gan_type="gan", fm_weight=10.0, dice_weight=1.0, l1_weight=30.0,
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


def tiny_criteria(args):
    return [adversarial.Criterion(args.gan_type),
            featmat.Criterion(args.fm_weight),
            dice.Criterion(args.dice_weight),
            l1_rgb.Criterion(args.l1_weight)]


def tiny_batch(args, key=0):
    loader = SyntheticDataLoader(args.image_size, args.batch_size,
                                 num_labels=args.num_labels,
                                 num_enc_frames=2, seed=key)
    data_dict, target_dict = loader.get_batch(0)
    return {**data_dict, **target_dict}


@pytest.fixture(scope="module")
def setup_meta():
    args = tiny_args()
    models = tiny_models(args)
    criteria = tiny_criteria(args)
    opt_g, opt_d = build.build_optimizers(
        args, {"discriminators": dis_mod})
    state = build.init_train_state(args, models, opt_g, opt_d,
                                   jax.random.PRNGKey(0))
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)
    return args, models, criteria, state, step_fn


def test_train_step_runs_and_updates(setup_meta):
    args, models, criteria, state, step_fn = setup_meta
    batch = tiny_batch(args)
    new_state, scalars = step_fn(state, batch, jax.random.PRNGKey(1))

    assert int(new_state.step) == 1
    for name in ("Loss_adversarial_G", "Loss_adversarial_D",
                 "Loss_feature_matching", "Loss_segmentation_dice",
                 "Loss_l1_rgb"):
        val = float(scalars[name])
        assert np.isfinite(val), name

    # params actually moved
    old = jax.tree_util.tree_leaves(state.params["generator"])
    new = jax.tree_util.tree_leaves(new_state.params["generator"])
    moved = any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(old, new))
    assert moved


def test_spectral_state_advances(setup_meta):
    args, models, criteria, state, step_fn = setup_meta
    batch = tiny_batch(args)
    new_state, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    old_u = jax.tree_util.tree_leaves(state.spectral["discriminator"])
    new_u = jax.tree_util.tree_leaves(new_state.spectral["discriminator"])
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(old_u, new_u))


def test_ema_tracks_params(setup_meta):
    args, models, criteria, state, step_fn = setup_meta
    batch = tiny_batch(args)
    s1, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    # ema = 0.999*old + 0.001*new
    p_old = state.params["generator"]["head_conv"]["kernel"]
    p_new = s1.params["generator"]["head_conv"]["kernel"]
    expected = p_old * 0.999 + p_new * 0.001
    np.testing.assert_allclose(
        np.asarray(s1.ema_params["generator"]["head_conv"]["kernel"]),
        np.asarray(expected), rtol=1e-5)


def test_d_step_does_not_touch_g_and_vice_versa(setup_meta):
    """Gradient isolation: G grads must not depend on live D params and
    loss_D must not backprop into the generator (stop-gradient surgery)."""
    args, models, criteria, state, step_fn = setup_meta
    batch = tiny_batch(args)

    opt_g, opt_d = build.build_optimizers(args, {"discriminators": dis_mod})

    def loss_parts(trainable):
        from latentpose_tpu.runners.holycow import apply_criteria, forward
        from latentpose_tpu.runners.state import merge_trainable
        full = merge_trainable(state.params, trainable["g"], trainable["d"])
        dd, _, _ = forward(models, full, state.batch_stats, state.spectral,
                           batch, rng=jax.random.PRNGKey(0), train=True,
                           finetune=False)
        lg, ld = apply_criteria(criteria, dd)
        return sum(lg.values()), sum(ld.values())

    trainable = {"g": g_trainable(state.params, False),
                 "d": {"discriminator": state.params["discriminator"]}}

    grads_G = jax.grad(lambda t: loss_parts(t)[0])(trainable)
    # loss_G must produce zero gradient wrt discriminator params
    d_leaves = jax.tree_util.tree_leaves(grads_G["d"])
    assert all(float(jnp.abs(l).max()) == 0.0 for l in d_leaves)

    grads_D = jax.grad(lambda t: loss_parts(t)[1])(trainable)
    g_leaves = jax.tree_util.tree_leaves(grads_D["g"])
    assert all(float(jnp.abs(l).max()) == 0.0 for l in g_leaves)
    # and loss_D must produce nonzero gradient somewhere in D
    d_leaves = jax.tree_util.tree_leaves(grads_D["d"])
    assert any(float(jnp.abs(l).max()) > 0.0 for l in d_leaves)


def test_finetune_step_runs():
    args = tiny_args(finetune=True)
    models = tiny_models(args)
    criteria = tiny_criteria(args)
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": dis_mod})
    # fine-tune: discriminator W becomes a single row (num_labels=1)
    models["discriminator"] = dis_mod.Discriminator(
        num_channels=args.num_channels, max_num_channels=args.max_num_channels,
        embed_channels=args.embed_channels, num_blocks=args.dis_num_blocks,
        image_size=args.image_size, num_labels=1)
    state = build.init_train_state(
        args, models, opt_g, opt_d, jax.random.PRNGKey(0), finetune=True,
        finetune_embedding=jnp.ones((1, args.embed_channels)) * 0.1)
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)

    loader = SyntheticDataLoader(args.image_size, args.batch_size,
                                 num_labels=1, num_enc_frames=2,
                                 finetune=True)
    d, t = loader.get_batch(0)
    t["label"] = np.zeros_like(t["label"])
    batch = {**d, **t}
    new_state, scalars = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(scalars["loss_G"]))
    # the avatar embedding itself must train
    diff = jnp.abs(new_state.params["finetune_embedding"]
                   - state.params["finetune_embedding"]).max()
    assert float(diff) > 0


def test_grad_accum_matches_manual_microbatch_reference():
    """--grad_accum_steps k: the scanned accumulation must equal a manual
    k-microbatch reference (same forward via holycow.forward, BN/spectral
    threaded microbatch-to-microbatch, grads averaged, ONE optimizer
    update) — the TPU-native analog of horovod backward_passes_per_step
    (reference train.py:201-211)."""
    from latentpose_tpu.runners.state import d_trainable, merge_trainable

    import optax

    k = 2
    args = tiny_args(batch_size=4, grad_accum_steps=k)
    models = tiny_models(args)
    criteria = tiny_criteria(args)
    # Plain SGD, deliberately: param deltas are then LINEAR in the averaged
    # gradients, so (a) tight tolerances are valid (scan-vs-unrolled f32
    # reassociation stays ~1e-7 instead of being amplified to O(lr) sign
    # flips by Adam's m/sqrt(v) normalization on near-zero grads) and
    # (b) a sum-instead-of-mean bug shows as a factor-k delta — Adam is
    # scale-invariant in the gradient and would mask it.
    opt_g = optax.sgd(1e-2)
    opt_d = optax.sgd(1e-2)
    state = build.init_train_state(args, models, opt_g, opt_d,
                                   jax.random.PRNGKey(0))
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)

    batch = tiny_batch(args)
    rng = jax.random.PRNGKey(3)
    new_state, scalars = step_fn(state, batch, rng)
    assert int(new_state.step) == 1
    assert np.isfinite(float(scalars["loss_G"]))

    # ---- manual reference ------------------------------------------------
    _, rng_rest = jax.random.split(rng)           # mirrors the aug split
    micro_rngs = jax.random.split(rng_rest, k)
    trainable = {"g": g_trainable(state.params, False),
                 "d": d_trainable(state.params)}

    def loss_fn(tr, bs, spec, mb, mrng):
        full = merge_trainable(state.params, tr["g"], tr["d"])
        dd, nbs, nspec = holycow.forward(
            models, full, bs, spec, mb, rng=mrng, train=True,
            finetune=False, update_stats=True, compute_dtype=None)
        lg, ld = holycow.apply_criteria(criteria, dd)
        total = sum(lg.values()) + sum(ld.values())
        return total, (nbs, nspec)

    bs, spec = state.batch_stats, state.spectral
    gsum = None
    for i in range(k):
        mb = {key: v[i * 2:(i + 1) * 2] for key, v in batch.items()}
        (_, (bs, spec)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, bs, spec, mb, micro_rngs[i])
        gsum = grads if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, grads)
    gmean = jax.tree_util.tree_map(lambda g: g / k, gsum)

    upd_g, _ = opt_g.update(gmean["g"], state.opt_state_g, trainable["g"])
    new_g = optax.apply_updates(trainable["g"], upd_g)
    upd_d, _ = opt_d.update(gmean["d"], state.opt_state_d, trainable["d"])
    new_d = optax.apply_updates(trainable["d"], upd_d)
    ref_params = merge_trainable(state.params, new_g, new_d)

    # lax.scan compiles the microbatch body once, the manual loop traces it
    # per call — XLA fuses the two differently, so allow f32 reassociation
    # noise; under SGD that noise is NOT amplified, so the tolerance is
    # tight enough that unaveraged grads (factor k) or unthreaded
    # BN/spectral state fail by orders of magnitude.
    for ours, ref in zip(jax.tree_util.tree_leaves(new_state.params),
                         jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)
    # spectral PI state advanced exactly k-times-threaded
    for ours, ref in zip(jax.tree_util.tree_leaves(new_state.spectral),
                         jax.tree_util.tree_leaves(spec)):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)


def test_grad_accum_rejects_indivisible_batch():
    args = tiny_args(batch_size=3, grad_accum_steps=2)
    models = tiny_models(args)
    criteria = tiny_criteria(args)
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": dis_mod})
    state = build.init_train_state(args, models, opt_g, opt_d,
                                   jax.random.PRNGKey(0))
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)
    batch = tiny_batch(args)
    with pytest.raises(ValueError, match="must divide"):
        step_fn(state, batch, jax.random.PRNGKey(1))
