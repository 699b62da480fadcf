"""Few-shot fine-tuning as a pure re-parameterization (SURVEY.md §0, §7).

Reference protocol (``train.py:218-279``):
1. compute ê = mean identity embedding over all of the avatar's frames,
   using the *EMA* embedder in eval mode (``train.py:240-259``);
2. generator: the identity embedding becomes a trainable parameter
   initialized with ê (``generators/...noBottleneck.py:139-163``);
3. discriminator: the N x 512 label-embedding matrix W is replaced by a
   single row initialized with ê (``discriminators/no_landmarks.py:110-136``);
4. embedder: identity path disabled, pose encoder kept frozen
   (``embedders/...segmentation.py:34,60-63``, ``holycow.py:36-37``);
5. optimizers re-initialized (``train.py:277-279``), RAdam / EMA alpha 0.972.

Here all of that is a function old_state -> new_state; no module mutates.
"""

from __future__ import annotations

import copy
import logging

import jax
import jax.numpy as jnp
import numpy as np

from latentpose_tpu.runners.state import TrainState, d_trainable, g_trainable

logger = logging.getLogger("latentpose_tpu.finetune")


def compute_averaged_identity_embedding(models, state, dataloader, args):
    """ê over every avatar frame, with the EMA embedder in eval mode."""
    embedder = models["embedder"]
    emb_params = state.ema_params.get("embedder", state.params["embedder"])
    variables = {"params": emb_params,
                 "batch_stats": state.batch_stats["embedder"],
                 "spectral": state.spectral.get("embedder", {})}
    needs_stickmen = "enc_stickmen" in getattr(embedder, "INPUT_KEYS", ())

    @jax.jit
    def embed(enc_rgbs, enc_stickmen=None):
        if needs_stickmen:
            _, elemwise = embedder.apply(
                variables, enc_rgbs, enc_stickmen, train=False,
                method="get_identity_embedding")
        else:
            _, elemwise = embedder.apply(variables, enc_rgbs, train=False,
                                         method="get_identity_embedding")
        return elemwise.reshape(-1, args.embed_channels)

    from latentpose_tpu.runners.loop import dequantize_batch_host
    chunks = []
    for data_dict, _ in dataloader:
        data_dict = dequantize_batch_host(data_dict)  # uint8 wire format
        stick = data_dict.get("enc_stickmen")
        chunks.append(np.asarray(embed(
            jnp.asarray(data_dict["enc_rgbs"]),
            jnp.asarray(stick) if stick is not None else None)))
    embedding = np.concatenate(chunks, axis=0).mean(axis=0)
    logger.info("Averaged identity embedding over %d frame-chunks",
                len(chunks))
    return jnp.asarray(embedding)[None]  # (1, embed_channels)


def make_finetune_discriminator(models_module_cls, args):
    """A fresh discriminator module with num_labels=1."""
    saved = args.num_labels
    args.num_labels = 1
    try:
        return models_module_cls.get_net(args)
    finally:
        args.num_labels = saved


def enable_finetuning(state: TrainState, models, dis_wrapper, args,
                      identity_embedding, opt_g, opt_d, rng,
                      gen_wrapper=None):
    """Produce (new_models, new_state) re-parameterized for fine-tuning.

    ``identity_embedding``: (1, embed_channels) = ê (or None for random init,
    parity with reference enable_finetuning(data_dict=None)).
    ``gen_wrapper``: the generator plugin's Wrapper; if it defines
    ``make_finetune_state`` (e.g. FSTH trains the packed AdaIN params), that
    decides the per-avatar trainable leaves; default = the identity
    embedding itself (flagship, reference generators/...noBottleneck.py:
    139-163).
    """
    if identity_embedding is None:
        identity_embedding = jax.random.uniform(
            rng, (1, args.embed_channels))

    if gen_wrapper is not None and hasattr(gen_wrapper,
                                           "make_finetune_state"):
        gen_variables = {"params": state.params["generator"],
                         "spectral": state.spectral["generator"]}
        finetune_leaves = gen_wrapper.make_finetune_state(
            models["generator"], gen_variables, identity_embedding, rng)
    else:
        finetune_leaves = {"finetune_embedding": identity_embedding}

    new_models = dict(models)
    new_dis = make_finetune_discriminator(dis_wrapper, args)
    new_models["discriminator"] = new_dis

    # Fresh shapes for the 1-row embed matrix + its spectral state.
    dis_in = getattr(new_dis, "in_channels", 3)
    img = jnp.zeros((1, args.image_size, args.image_size, dis_in))
    dis_vars = new_dis.init(rng, img, jnp.zeros((1,), jnp.int32))

    # Copy every trunk param from the meta-trained discriminator; W := ê.
    new_dis_params = copy.deepcopy(dict(dis_vars["params"]))
    for key, val in state.params["discriminator"].items():
        if key != "embed":
            new_dis_params[key] = val
    # NB: distinct buffers (not aliases of ê) — the jitted step donates the
    # state, and XLA rejects the same buffer donated twice.
    new_dis_params["embed"] = {
        "embedding": jnp.array(identity_embedding, jnp.float32)}

    new_dis_spectral = dict(dis_vars["spectral"])
    for key, val in state.spectral["discriminator"].items():
        if key != "embed":
            new_dis_spectral[key] = val

    params = dict(state.params)
    params["discriminator"] = new_dis_params
    # NB: distinct buffers per leaf (the jitted step donates the state and
    # XLA rejects a buffer donated twice).
    for key, value in finetune_leaves.items():
        params[key] = jnp.array(value, jnp.float32)

    spectral = dict(state.spectral)
    spectral["discriminator"] = new_dis_spectral

    # EMA: generator + the avatar trainables follow the live weights
    # (reference running_averages['generator'].enable_finetuning —
    # ``train.py:267-272``); embedder EMA kept for the frozen pose encoder.
    ema = dict(state.ema_params)
    for key, value in finetune_leaves.items():
        ema[key] = jnp.array(value, jnp.float32)

    new_state = TrainState(
        step=state.step,
        params=params,
        batch_stats=state.batch_stats,
        spectral=spectral,
        opt_state_g=opt_g.init(g_trainable(params, True)),
        opt_state_d=opt_d.init(d_trainable(params)),
        ema_params=ema,
        finetune=True,
    )
    return new_models, new_state
