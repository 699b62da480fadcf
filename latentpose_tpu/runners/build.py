"""Construction of models, criteria, optimizers, and the initial TrainState.

This is the functional analog of the reference's module instantiation in
``train.py:137-175`` + ``TrainingModule.__init__``/EMA setup
(``runners/holycow.py:44-109``).
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import jax
import jax.numpy as jnp

from latentpose_tpu.models.discriminators import no_landmarks as _dis_default
from latentpose_tpu.runners import holycow
from latentpose_tpu.runners.state import TrainState, d_trainable, g_trainable


def build_models(args, modules) -> Dict[str, Any]:
    return {
        "embedder": modules["embedders"].Wrapper.get_net(args),
        "generator": modules["generators"].Wrapper.get_net(args),
        "discriminator": modules["discriminators"].Wrapper.get_net(args),
    }


def build_criteria(args, modules):
    return [m.Wrapper.get_net(args) for m in modules["criterions"]]


def build_optimizers(args, modules):
    opt_g = holycow.get_gen_optimizer(args)
    dis_wrapper = modules["discriminators"].Wrapper if modules.get(
        "discriminators") else _dis_default.Wrapper
    opt_d = dis_wrapper.get_optimizer(args)
    return opt_g, opt_d


def init_variables(args, models, rng):
    """Initialize all model variables with dummy batches (shapes only)."""
    h = w = args.image_size
    rng_e, rng_g, rng_d = jax.random.split(rng, 3)

    frame_shapes = {
        "enc_rgbs": (1, 1, h, w, 3),
        "pose_input_rgbs": (1, 1, h, w, 3),
        "enc_stickmen": (1, 1, h, w, 3),
    }
    emb_inputs = [jnp.zeros(frame_shapes[k], jnp.float32)
                  for k in models["embedder"].INPUT_KEYS]
    emb_vars = models["embedder"].init(rng_e, *emb_inputs)

    gen_inputs = {
        "embeds": jnp.zeros((1, args.embed_channels), jnp.float32),
        "pose_embedding": jnp.zeros((1, args.pose_embedding_size),
                                    jnp.float32),
        "dec_stickmen": jnp.zeros((1, 1, h, w, 3), jnp.float32),
        "dec_keypoints": jnp.zeros((1, 1, 136), jnp.float32),
        "enc_rgbs": jnp.zeros((1, 1, h, w, 3), jnp.float32),
        "pose_input_rgbs": jnp.zeros((1, 1, h, w, 3), jnp.float32),
    }
    gen_inputs = {k: v for k, v in gen_inputs.items()
                  if k in models["generator"].INPUT_KEYS}
    gen_vars = models["generator"].init(rng_g, gen_inputs)

    dis_in = getattr(models["discriminator"], "in_channels", 3)
    img = jnp.zeros((1, h, w, dis_in), jnp.float32)
    labels = jnp.zeros((1,), jnp.int32)
    dis_vars = models["discriminator"].init(rng_d, img, labels)

    return emb_vars, gen_vars, dis_vars


def _merge_overlay(existing, src, label):
    """Replace leaves of `existing` by same-path leaves of `src`;
    unknown keys or shape mismatches are conversion bugs -> error."""
    if not isinstance(existing, dict):
        src = jnp.asarray(src)
        if src.shape != existing.shape:
            raise ValueError(
                f"pretrained overlay {label}: shape {src.shape} != model "
                f"{existing.shape}")
        return src.astype(existing.dtype)
    out = dict(existing)
    for key, value in src.items():
        if key not in existing:
            raise ValueError(
                f"pretrained overlay {label}: unknown key {key!r} "
                f"(model has {sorted(existing)})")
        out[key] = _merge_overlay(existing[key], value, f"{label}/{key}")
    return out


def overlay_pretrained(models, params, batch_stats):
    """Inject converted frozen-dependency weights (X2Face / FAbNet — see
    WEIGHTS.md) into freshly initialized trees.  Models declare
    ``PRETRAINED = ((target_subtree, npz_filename, source_subtree), ...)``;
    files are discovered via utils/weights.find_weights_file and silently
    skipped when absent (the wrappers already warn loudly)."""
    from latentpose_tpu.utils.weights import (find_weights_file,
                                              load_flat_npz_variables)
    for component, model in models.items():
        for target, filename, source in getattr(model, "PRETRAINED", ()):
            path = find_weights_file(filename)
            if path is None:
                continue
            variables = load_flat_npz_variables(path)
            for coll, store in (("params", params),
                                ("batch_stats", batch_stats)):
                src = variables.get(coll, {})
                for part in [p for p in source.split("/") if p]:
                    src = src.get(part, {})
                if not src or component not in store:
                    continue
                node = store[component]
                parts = [p for p in target.split("/") if p]
                for part in parts[:-1]:
                    node = node[part]
                label = f"{component}:{filename}"
                if parts:
                    node[parts[-1]] = _merge_overlay(node[parts[-1]], src,
                                                     label)
                else:
                    store[component] = _merge_overlay(store[component], src,
                                                      label)


def init_train_state(args, models, opt_g, opt_d, rng,
                     finetune: bool = False,
                     finetune_embedding=None,
                     finetune_leaves=None) -> TrainState:
    """``finetune_leaves``: the per-avatar trainable leaves (name -> array),
    e.g. ``{"finetune_embedding": ê}`` or FSTH's ``{"finetune_affine": A}``.
    Used when rebuilding a skeleton to restore a fine-tuned checkpoint into
    (cli/train.py, cli/drive.py) — the leaf NAMES and the matching
    ``ema_params`` entries must exist in the skeleton or flax's
    ``from_state_dict`` silently drops the saved values."""
    emb_vars, gen_vars, dis_vars = init_variables(args, models, rng)

    # Collections may be absent (e.g. the X2Face passthrough embedder has no
    # params at all, the none-discriminator no spectral state).
    params = {
        "embedder": emb_vars.get("params", {}),
        "generator": gen_vars.get("params", {}),
        "discriminator": dis_vars.get("params", {}),
    }
    if finetune:
        if finetune_leaves is None:
            if finetune_embedding is None:
                finetune_embedding = jax.random.uniform(
                    rng, (1, args.embed_channels))
            finetune_leaves = {"finetune_embedding": finetune_embedding}
        params.update({k: jnp.asarray(v, jnp.float32)
                       for k, v in finetune_leaves.items()})

    batch_stats = {"embedder": emb_vars.get("batch_stats", {})}
    # converted frozen-dependency weights (before EMA deepcopy)
    overlay_pretrained(models, params, batch_stats)
    spectral = {"embedder": emb_vars.get("spectral", {}),
                "generator": gen_vars.get("spectral", {}),
                "discriminator": dis_vars.get("spectral", {})}

    ema_params = {"embedder": copy.deepcopy(params["embedder"]),
                  "generator": copy.deepcopy(params["generator"])}
    if finetune:
        # EMA tracks the avatar trainables too (runners/finetune.py:133-137;
        # drive.py prefers the EMA copy) — distinct buffers (donation)
        ema_params.update({k: jnp.array(params[k])
                           for k in finetune_leaves})

    return TrainState(
        step=jnp.zeros((), jnp.int32) + int(getattr(args, "iteration", 0)),
        params=params,
        batch_stats=batch_stats,
        spectral=spectral,
        opt_state_g=opt_g.init(g_trainable(params, finetune)),
        opt_state_d=opt_d.init(d_trainable(params)),
        ema_params=ema_params,
        finetune=finetune,
    )
