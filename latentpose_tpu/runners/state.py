"""TrainState — the complete training-time pytree.

Everything the reference keeps as mutable module/optimizer state lives here
explicitly (SURVEY.md §7 design stance):

- ``params``: {'embedder', 'generator', 'discriminator'} (+
  'finetune_embedding' after the fine-tune re-parameterization);
- ``batch_stats``: embedder BatchNorm running stats (torch buffers);
- ``spectral``: spectral-norm power-iteration (u, v) state for generator and
  discriminator — advanced exactly as many times per step as the reference's
  forward count (see runners/holycow.py);
- ``opt_state_g`` / ``opt_state_d``: optax states for the two optimizers
  (reference ``runners/holycow.py:34-41``, ``discriminators/no_landmarks.py:
  26-28``);
- ``ema_params``: weights' running averages for embedder + generator
  (reference ``runners/holycow.py:99-109``); BN buffers are *copied* each
  step in the reference, i.e. EMA inference uses the live ``batch_stats`` —
  we therefore don't duplicate them;
- ``step``: global iteration counter (reference ``args.iteration``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray                 # () int32
    params: Any                       # dict of model param trees
    batch_stats: Any                  # {'embedder': ...}
    spectral: Any                     # {'generator': ..., 'discriminator': ...}
    opt_state_g: Any
    opt_state_d: Any
    ema_params: Any                   # {'embedder': ..., 'generator': ...}
    finetune: bool = struct.field(pytree_node=False, default=False)


def g_trainable(params, finetune: bool):
    """The generator-side optimizer's target subtree.

    Meta-training: generator + embedder (reference ``holycow.py:34-41``).
    Fine-tuning: generator + the per-avatar identity embedding; the embedder
    (pose encoder) is frozen (reference ``holycow.py:36-37``,
    ``train.py:277-279``).
    """
    if finetune:
        out = {"generator": params["generator"]}
        # per-avatar trainables: finetune_embedding (flagship/FSTH_plus) or
        # finetune_affine (FSTH) — anything the re-parameterization added
        out.update({k: v for k, v in params.items()
                    if k.startswith("finetune_")})
        return out
    return {"generator": params["generator"],
            "embedder": params["embedder"]}


def d_trainable(params):
    return {"discriminator": params["discriminator"]}


def merge_trainable(params, g_tree, d_tree):
    """Reassemble the full params dict from trainable subtrees."""
    merged = dict(params)
    merged.update(g_tree)
    merged.update(d_tree)
    return merged
