"""The runner: one XLA program = G forward + D's three passes + all six
losses + both optimizer updates + the EMA update.

Re-design of the reference ``runners/holycow.py`` for TPU:

- The reference's ``loss_G.backward(retain_graph=True); opt_G.step();
  loss_D.backward(); opt_D.step()`` (``:238-252``) becomes ONE
  ``value_and_grad`` over the combined scalar
  ``loss_G(g, stop_grad(d)) + loss_D(stop_grad(g outputs), d)`` —
  the stop-gradient surgery reproduces exactly the gradients the two
  backwards produce, while letting XLA share every forward computation
  (SURVEY.md §7 "two-optimizer GAN step in one XLA program").
- The discriminator's three passes (fake-through-G-graph, fake-detached,
  real — reference ``discriminators/no_landmarks.py:154-161``) run in the
  same order, threading the spectral-norm power-iteration state through
  them, so (u, v) advance 3x per step exactly as torch's forward hooks do.
- EMA (``:99-109``): fused tree_map inside the same program,
  alpha = 0.972 fine-tune / 0.999 meta (``:257``).
- Data parallelism: the step is written over the *global* batch; under
  ``jit`` with a Mesh and batch sharded on the 'data' axis, XLA partitions it
  and inserts the gradient all-reduces over ICI (replacing
  NCCL/apex.Reducer/horovod — reference ``train.py:97-211``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

# imported at module scope: importing it inside the traced step would run
# the module body under the trace (jax.errors.UnexpectedTracerError)
from latentpose_tpu.data.augmentation import augment_data_dict
from latentpose_tpu.runners.state import (TrainState, d_trainable,
                                          g_trainable, merge_trainable)


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--iteration", type=int, default=0)
        parser.add("--log_frequency_loss", type=int, default=1)
        parser.add("--log_frequency_images", type=int, default=100)
        parser.add("--log_frequency_fixed_images", type=int, default=2500)
        parser.add("--detailed_metrics", action="store_bool", default=True)
        parser.add("--num_visuals_per_img", default=2, type=int)
        parser.add("--fixed_val_ids", action="append", type=int,
                   default=[50, 100, 200, 250, 300])
        parser.add("--batch_size_inference", default=5, type=int)
        parser.add("--grad_accum_steps", default=1, type=int,
                   help="Split each batch into this many microbatches "
                        "inside the jitted step (lax.scan), averaging "
                        "gradients before the single optimizer update — "
                        "the TPU-native analog of the reference's horovod "
                        "backward_passes_per_step regime (reference "
                        "train.py:201-211): scale the effective batch "
                        "beyond what fits in HBM at once")
        parser.add("--transfer_dtype", type=str, default="float32",
                   help="float32|uint8.  uint8 sends image batches to the "
                        "device as bytes and rescales to [0,1] inside the "
                        "jitted step — 4x less host->device traffic (the "
                        "source frames are uint8 JPEG anyway; only the "
                        "/255 moves on-device).  Worth it whenever the "
                        "feed link bounds input, e.g. network-attached "
                        "TPU or many chips per host.")
        parser.add("--grad_dtype", type=str, default="float32",
                   help="float32|bfloat16.  bfloat16 compresses the "
                        "cross-device gradient reduction to half the "
                        "bytes — the analog of the reference's horovod "
                        "fp16-compressed allreduce (train.py:110-116), "
                        "for the cross-slice/DCN regime where gradient "
                        "bytes, not FLOPs, bound step time.  Implemented "
                        "as an explicit shard_map gradient pass with a "
                        "bf16 pmean (GSPMD's implicit reduce dtype is "
                        "not directly controllable).")
        parser.add("--explicit_grad_reduce", action="store_bool",
                   default=False,
                   help="Force the explicit shard_map gradient pass even "
                        "with f32 grads: per-shard batch statistics and "
                        "per-shard loss means, i.e. the reference's "
                        "per-GPU DDP semantics, without gradient "
                        "compression.  (--grad_dtype bfloat16 implies "
                        "this path.)")
        return parser


def get_gen_optimizer(args) -> optax.GradientTransformation:
    """Generator-side optimizer (reference ``holycow.py:34-41``):
    Adam/RAdam(lr_gen, betas=(beta1, 0.999), eps=1e-5) over generator
    (+ embedder unless fine-tuning)."""
    opt = {"Adam": optax.adam, "RAdam": optax.radam}[args.optimizer]
    return opt(args.lr_gen, b1=args.beta1, b2=0.999, eps=1e-5)


def dequantize_batch(batch):
    """uint8 image arrays -> f32 in [0, 1], on device, inside the jitted
    program.  The wire format for ``--transfer_dtype uint8``: host->device
    transfer carries 1 byte/pixel instead of 4 (the source data is uint8
    JPEG anyway — only the division point moves), which matters whenever
    the feed link, not HBM, bounds input (network-attached TPUs, thin PCIe).
    """
    def deq(x):
        if hasattr(x, "dtype") and x.dtype == jnp.uint8:
            # true division (not *1/255): bit-identical to the host-side
            # uint8->f32 conversion the datasets/reference perform
            return x.astype(jnp.float32) / 255.0
        return x
    return {k: deq(v) for k, v in batch.items()}


def forward(models, params, batch_stats, spectral, batch,
            rng=None, train=True, finetune=False, update_stats=True,
            compute_losses=True, compute_dtype=None):
    """Run embedder -> generator -> discriminator(3 passes), producing the
    populated data_dict (reference ``TrainingModule.forward``,
    ``holycow.py:153-201``) plus the mutated variable collections.

    All returned scores/features follow the reference's data_dict key names.
    """
    batch = dequantize_batch(batch)
    embedder = models["embedder"]
    generator = models["generator"]
    discriminator = models["discriminator"]

    data_dict: Dict[str, Any] = dict(batch)
    new_batch_stats = dict(batch_stats)
    new_spectral = dict(spectral)

    # Mixed precision: activations in bfloat16 (params stay f32; instance
    # norm statistics and loss math stay f32 — see ops/norms.py and the
    # criteria).  MXU-bound convs roughly double in throughput.
    if compute_dtype is not None and compute_dtype != jnp.float32:
        for key in ("enc_rgbs", "pose_input_rgbs", "enc_stickmen",
                    "dec_stickmen"):
            if batch.get(key) is not None:
                batch = {**batch, key: batch[key].astype(compute_dtype)}

    rngs = {}
    if train and rng is not None:
        rngs = {"dropout": rng}

    # --- Embedder ---------------------------------------------------------
    emb_vars = {"params": params["embedder"],
                "batch_stats": batch_stats["embedder"],
                "spectral": spectral.get("embedder", {})}

    def apply_embedder(*inputs, method=None):
        if train:
            # BN running stats (torch train-mode buffers) + spectral-norm
            # power iteration (one update per forward, like torch's hook)
            out, mut = embedder.apply(emb_vars, *inputs, train=True,
                                      method=method, rngs=rngs,
                                      mutable=["batch_stats", "spectral"])
            if "batch_stats" in mut:
                new_batch_stats["embedder"] = mut["batch_stats"]
            if "spectral" in mut:
                new_spectral["embedder"] = mut["spectral"]
            return out
        return embedder.apply(emb_vars, *inputs, train=False, method=method)

    bsz = batch["pose_input_rgbs"].shape[0] \
        if "pose_input_rgbs" in batch else batch["enc_rgbs"].shape[0]
    if finetune:
        # Identity path disabled (reference embedders/...segmentation.py:34,
        # 60-63); per-avatar trainables come from the train state.
        if "pose_input_rgbs" in batch:
            pose_embedding = apply_embedder(batch["pose_input_rgbs"],
                                            method="get_pose_embedding")
        else:
            pose_embedding = None
        embeds = None
        if "finetune_embedding" in params:
            embeds = jnp.broadcast_to(
                params["finetune_embedding"],
                (bsz,) + params["finetune_embedding"].shape[1:])
        embeds_elemwise = None
    else:
        emb_inputs = [batch.get(k) for k in embedder.INPUT_KEYS]
        embeds, embeds_elemwise, pose_embedding = apply_embedder(*emb_inputs)
    data_dict["embeds"] = embeds
    data_dict["embeds_elemwise"] = embeds_elemwise
    data_dict["pose_embedding"] = pose_embedding

    # --- Generator (uniform dict-input protocol) --------------------------
    gen_inputs = {k: data_dict.get(k)
                  for k in generator.INPUT_KEYS if data_dict.get(k)
                  is not None}
    if finetune and "finetune_affine" in params:
        # FSTH-style fine-tuning: the packed AdaIN params are the trainable
        # leaves (reference generators/FSTH.py:132-150)
        gen_inputs["finetune_affine"] = jnp.broadcast_to(
            params["finetune_affine"],
            (bsz,) + params["finetune_affine"].shape[1:])
    gen_vars = {"params": params["generator"],
                "spectral": spectral["generator"]}
    (fake_rgbs, fake_segm), mut = generator.apply(
        gen_vars, gen_inputs, update_stats=update_stats,
        mutable=["spectral"])
    new_spectral["generator"] = mut["spectral"]
    data_dict["fake_rgbs"] = fake_rgbs.astype(jnp.float32)
    if fake_segm is not None:
        data_dict["fake_segm"] = fake_segm.astype(jnp.float32)

    if not compute_losses:
        return data_dict, new_batch_stats, new_spectral

    # --- Discriminator: 3 passes, reference order (no_landmarks.py:138-166)
    d_params = params["discriminator"]
    d_params_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, d_params)
    spec_d = spectral["discriminator"]
    sg = jax.lax.stop_gradient

    target_rgbs = batch["target_rgbs"]
    if target_rgbs.ndim > 4:
        target_rgbs = target_rgbs[:, 0]
    label = batch["label"]
    fake_in = discriminator.make_input(data_dict, fake_rgbs)
    real_in = discriminator.make_input(data_dict, target_rgbs)
    if compute_dtype is not None:
        fake_in = fake_in.astype(compute_dtype)
        real_in = real_in.astype(compute_dtype)

    def embed_lookup(p, spec, upd):
        out, mut_ = discriminator.apply(
            {"params": p, "spectral": spec}, label, update_stats=upd,
            method="embed_labels", mutable=["spectral"])
        return out, mut_.get("spectral", spec)

    def dis_pass(p, spec, x, embed_vec, upd):
        (score, feats), mut_ = discriminator.apply(
            {"params": p, "spectral": spec}, x, embed_vec,
            update_stats=upd, method="pass_inputs", mutable=["spectral"])
        return score, feats, mut_.get("spectral", spec)

    # Embedding rows: looked up once with live D params (one PI update).
    embed_rows, spec_d = embed_lookup(d_params, spec_d, update_stats)
    embed_rows_sg = sg(embed_rows) if embed_rows is not None else None

    # Pass 1 — fake through the G graph: grads flow into the generator side
    # only, so D params and the projection rows are stop-gradiented
    # (equivalent to torch's discarded D-grads from loss_G.backward()).
    fake_score_G, fake_features, spec_d = dis_pass(
        d_params_sg, spec_d, fake_in, embed_rows_sg, update_stats)

    # Pass 2 — fake detached, live D trunk, detached rows (reference
    # ``pass_inputs(fake_in.detach(), embed.detach())``).
    fake_score_D, _, spec_d = dis_pass(
        d_params, spec_d, sg(fake_in), embed_rows_sg, update_stats)

    # Pass 3 — real, live D params + rows.
    real_score, real_features, spec_d = dis_pass(
        d_params, spec_d, real_in, embed_rows, update_stats)

    new_spectral["discriminator"] = spec_d
    # loss math stays in f32 (scores/features upcast; XLA fuses the casts
    # into the reductions)
    f32 = lambda t: t.astype(jnp.float32) if t is not None else None
    data_dict["fake_features"] = [f32(f) for f in fake_features]
    data_dict["real_features"] = [f32(f) for f in real_features]
    data_dict["real_embedding"] = f32(embed_rows)
    data_dict["fake_score_G"] = f32(fake_score_G)
    data_dict["fake_score_D"] = f32(fake_score_D)
    data_dict["fake_score_D_for_G"] = f32(sg(fake_score_D))
    # Live for loss_D; stop-gradiented alias for any loss_G use (rgan/ragan).
    data_dict["real_score"] = f32(real_score)
    data_dict["real_score_for_G"] = f32(sg(real_score))

    return data_dict, new_batch_stats, new_spectral


def apply_criteria(criteria, data_dict):
    """Accumulate loss_G / loss_D dicts (reference ``holycow.py:176-201``)."""
    losses_G: Dict[str, jnp.ndarray] = {}
    losses_D: Dict[str, jnp.ndarray] = {}
    for criterion in criteria:
        out = criterion(data_dict)
        if isinstance(out, tuple):
            g, d = out
            losses_G.update(g)
            losses_D.update(d)
        else:
            losses_G.update(out)
    return losses_G, losses_D


def make_train_step(models, criteria, args, opt_g, opt_d, donate=False,
                    state_shardings=None, mesh=None):
    """Build the jitted train step.

    state, batch, rng -> (new_state, scalars) where scalars carries every
    individual loss term (reference per-iteration TB scalars).

    ``state_shardings`` (a TrainState-shaped tree of NamedShardings, see
    parallel/mesh.state_shardings) pins the OUTPUT state's placement — with
    `--param_sharding fsdp` this keeps params/EMA/optimizer moments sharded
    across steps instead of letting GSPMD gather them back to replicated.

    ``mesh`` enables the ``--grad_dtype bfloat16`` compressed-gradient path
    (explicit shard_map over 'data' with a bf16 pmean).
    """
    finetune = bool(args.finetune)
    ema_alpha = 0.972 if finetune else 0.999  # reference holycow.py:257
    train_mode = not args.set_eval_mode_in_train
    compute_dtype = jnp.bfloat16 \
        if getattr(args, "compute_dtype", "float32") == "bfloat16" else None
    use_pix = bool(getattr(args, "use_pixelwise_augs", False))
    use_scale = bool(getattr(args, "use_affine_scale", False))
    use_shift = bool(getattr(args, "use_affine_shift", False))

    def maybe_augment(batch, key):
        """On-device (driver, target, segm) augmentation — replaces the
        reference's host-side imgaug augment_triplet (see
        data/augmentation.py)."""
        return augment_data_dict(key, batch, use_pixelwise=use_pix,
                                 use_scale=use_scale, use_shift=use_shift)

    def loss_fn(trainable, params, batch_stats, spectral, batch, rng):
        full_params = merge_trainable(params, trainable["g"], trainable["d"])
        data_dict, new_bs, new_spec = forward(
            models, full_params, batch_stats, spectral, batch, rng=rng,
            train=train_mode, finetune=finetune, update_stats=True,
            compute_dtype=compute_dtype)
        losses_G, losses_D = apply_criteria(criteria, data_dict)
        loss_G = sum(losses_G.values())
        loss_D = sum(losses_D.values()) if losses_D else jnp.float32(0)
        total = loss_G + loss_D
        scalars = {f"Loss_{k}": v for k, v in {**losses_G,
                                               **losses_D}.items()}
        scalars["loss_G"] = loss_G
        scalars["loss_D"] = loss_D
        return total, (scalars, new_bs, new_spec)

    grad_accum = int(getattr(args, "grad_accum_steps", 1) or 1)
    grad_bf16 = getattr(args, "grad_dtype", "float32") == "bfloat16"
    explicit_reduce = grad_bf16 or bool(
        getattr(args, "explicit_grad_reduce", False))
    if explicit_reduce and mesh is None:
        raise ValueError(
            "--grad_dtype bfloat16 / --explicit_grad_reduce need a device "
            "mesh (--num_devices > 1)")

    def make_accum_grad_fn(grad_fn):
        """Microbatch accumulation with the grad_fn signature: split the
        (per-call) batch into ``grad_accum`` microbatches under lax.scan,
        run the full 4-pass GAN forward per microbatch (BN stats and
        spectral-norm power iteration advance per microbatch, like k
        reference forwards), and return f32-averaged gradients — each
        criterion is a mean over its microbatch rows, so the average over
        equal-size microbatches equals the full-batch gradient.  Peak
        activation memory drops ~grad_accum-x; grads live once (carried,
        not stacked).  Composes under make_explicit_grad_fn: accumulation stays
        f32 per shard, only the final cross-shard reduction is compressed —
        horovod's ``backward_passes_per_step`` + fp16 ``Compression``
        semantics (reference train.py:110-116,201-211)."""

        def accum_grads(trainable, params, bs, spec, batch, rng):
            bsz = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if bsz % grad_accum:
                raise ValueError(
                    f"--grad_accum_steps {grad_accum} must divide the "
                    f"batch size {bsz}")

            def split(x):
                return x.reshape(
                    (grad_accum, x.shape[0] // grad_accum) + x.shape[1:])

            micro = jax.tree_util.tree_map(split, batch)
            micro_rngs = jax.random.split(rng, grad_accum)

            def body(carry, xs):
                bs_c, spec_c, gsum = carry
                mb, mrng = xs
                (mloss, (mscal, nbs, nspec)), mgrads = grad_fn(
                    trainable, params, bs_c, spec_c, mb, mrng)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, mgrads)
                return (nbs, nspec, gsum), (mloss, mscal)

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), trainable)
            (new_bs, new_spec, gsum), (loss_stack, scal_stack) = \
                jax.lax.scan(body, (bs, spec, zeros), (micro, micro_rngs))
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
            scalars = jax.tree_util.tree_map(lambda s: s.mean(0), scal_stack)
            return (loss_stack.mean(0), (scalars, new_bs, new_spec)), grads

        return accum_grads

    def make_explicit_grad_fn(grad_fn, reduce_dtype):
        """Explicit-collective DP gradient pass: per-shard backward, then a
        cross-shard gradient mean in ``reduce_dtype`` — with bfloat16 the
        analog of the reference's horovod fp16 allreduce
        (``train.py:110-116``); with float32 the uncompressed per-GPU-DDP
        regime (``--explicit_grad_reduce``).

        Per-shard semantics deliberately match the reference's per-GPU
        behavior: batch stats are computed from the LOCAL shard's rows
        (torch BN under DDP computes per-device stats; the running averages
        are pmean'd here), loss scalars are pmean'd; spectral-norm power
        iteration depends only on the (replicated) weights, so its state is
        identical on every shard.
        """
        import functools

        from jax.sharding import PartitionSpec as P
        try:
            # jax >= 0.8: keyword-only specs, replication check is check_vma
            shard_map = functools.partial(jax.shard_map, check_vma=False)
        except AttributeError:  # pre-0.8 jax
            from jax.experimental.shard_map import shard_map
            shard_map = functools.partial(shard_map, check_rep=False)

        def local_grads(trainable, params, bs, spec, local_batch, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            (loss, (scalars, nbs, nspec)), grads = grad_fn(
                trainable, params, bs, spec, local_batch, rng)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(
                    g.astype(reduce_dtype), "data").astype(jnp.float32),
                grads)
            scalars = jax.tree_util.tree_map(
                lambda s: jax.lax.pmean(s, "data"), scalars)
            nbs = jax.tree_util.tree_map(
                lambda s: jax.lax.pmean(s, "data"), nbs)
            return (loss, (scalars, nbs, nspec)), grads

        # check disabled: new_spectral is genuinely replicated (the power
        # iteration depends only on the replicated weights) but is not a
        # pmean output, so the conservative replication checker rejects it
        return shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("data"), P()),
            out_specs=((P(), (P(), P(), P())), P()))

    def train_step(state: TrainState, batch, rng):
        rng_aug, rng = jax.random.split(rng)
        batch = dequantize_batch(batch)  # --transfer_dtype uint8 wire format
        batch = maybe_augment(batch, rng_aug)
        trainable = {"g": g_trainable(state.params, finetune),
                     "d": d_trainable(state.params)}
        # Composition order matters: accumulation wraps the raw grad_fn so
        # each shard accumulates its microbatch grads in f32; the bf16
        # wrapper then compresses only the one final cross-shard pmean —
        # horovod's Compression.fp16 + backward_passes_per_step pairing.
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum > 1:
            grad_fn = make_accum_grad_fn(grad_fn)
        if explicit_reduce:
            grad_fn = make_explicit_grad_fn(
                grad_fn, jnp.bfloat16 if grad_bf16 else jnp.float32)
        (_, (scalars, new_bs, new_spec)), grads = grad_fn(
            trainable, state.params, state.batch_stats, state.spectral,
            batch, rng)

        updates_g, opt_state_g = opt_g.update(
            grads["g"], state.opt_state_g, trainable["g"])
        new_g = optax.apply_updates(trainable["g"], updates_g)

        updates_d, opt_state_d = opt_d.update(
            grads["d"], state.opt_state_d, trainable["d"])
        new_d = optax.apply_updates(trainable["d"], updates_d)

        new_params = merge_trainable(state.params, new_g, new_d)

        # EMA over embedder + generator params (reference holycow.py:99-109);
        # buffers (batch_stats) are copied, i.e. shared with the live model.
        # --no-weights_running_average disables tracking entirely (reference
        # train.py:163-164: running_averages = None).
        def ema_update(avg, p):
            return jax.tree_util.tree_map(
                lambda a, b: a * ema_alpha + b * (1.0 - ema_alpha), avg, p)

        if getattr(args, "weights_running_average", True):
            new_ema = {k: ema_update(state.ema_params[k], new_params[k])
                       for k in state.ema_params}
        else:
            new_ema = state.ema_params

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            spectral=new_spec,
            opt_state_g=opt_state_g,
            opt_state_d=opt_state_d,
            ema_params=new_ema,
        )
        return new_state, scalars

    # Donating the state buffers halves peak HBM in the real training loop;
    # tests keep the old state alive for comparisons, so it's opt-in.
    jit_kwargs = {}
    if state_shardings is not None:
        jit_kwargs["out_shardings"] = (state_shardings, None)
    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   **jit_kwargs)
