"""Checkpoint store — full-system parity with the reference (SURVEY.md §2.8,
``utils/utils.py:251-398``):

- a checkpoint carries *everything*: params (embedder/generator/
  discriminator [+ finetune_embedding]), both optimizer states, EMA copies,
  BN running stats, spectral-norm (u, v) state, AND the full args namespace
  (checkpoint args participate in config resolution, level 2);
- paths: ``{experiment_dir}/checkpoints/model_{iteration:08d}.ckpt`` with
  collision suffixing ``_0`` (reference ``:277-284``);
- process-0-only writes; disk-full cleanup deletes the partial file
  (reference ``:290-295``).

Format: one directory per checkpoint — ``meta.json`` (args + iteration,
readable without loading arrays, used by the 5-level config resolution) +
``arrays.npz`` (the flattened TrainState).
"""

from __future__ import annotations

import json
import logging
import shutil
from pathlib import Path

import numpy as np
import jax
from flax import serialization

logger = logging.getLogger("latentpose_tpu.checkpoint")

_SEP = "::"


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif tree is None:
        pass
    else:
        flat[prefix[:-len(_SEP)]] = np.asarray(tree)
    return flat


def _unflatten(flat):
    tree = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _sanitize_args(args) -> dict:
    out = {}
    for k, v in vars(args).items():
        if isinstance(v, Path):
            v = str(v)
        try:
            json.dumps(v)
        except TypeError:
            v = str(v)
        out[k] = v
    return out


def save_checkpoint(experiment_dir, state, args, iteration=None):
    """Write a checkpoint; returns its path.  Process-0-only."""
    if jax.process_index() != 0:
        return None
    iteration = int(state.step) if iteration is None else int(iteration)
    ckpt_dir = Path(experiment_dir) / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    path = ckpt_dir / f"model_{iteration:08d}.ckpt"
    while path.exists():  # collision suffixing (reference :277-284)
        path = path.with_name(path.name + "_0")
    path.mkdir(parents=True)

    try:
        state_dict = serialization.to_state_dict(state)
        flat = _flatten(state_dict)
        np.savez(path / "arrays.npz", **flat)
        meta = {
            "format_version": 1,
            "iteration": iteration,
            "finetune": bool(getattr(state, "finetune", False)),
            "args": _sanitize_args(args),
        }
        with open(path / "meta.json", "w") as f:
            json.dump(meta, f, indent=1)
    except OSError:
        logger.exception("Failed writing checkpoint %s — removing partial "
                         "file (disk full?)", path)
        shutil.rmtree(path, ignore_errors=True)
        raise
    logger.info("Saved checkpoint %s", path)
    return path


def load_arrays(checkpoint_path):
    """Load the raw nested state dict (numpy) of a checkpoint."""
    path = Path(checkpoint_path)
    with np.load(path / "arrays.npz") as raw:
        flat = {k: raw[k] for k in raw.files}
    return _unflatten(flat)


def peek_args(checkpoint_path) -> dict:
    """Read only the saved args (cheap; config-resolution level 2)."""
    meta_path = Path(checkpoint_path) / "meta.json"
    if not meta_path.exists():
        raise FileNotFoundError(meta_path)
    with open(meta_path) as f:
        meta = json.load(f)
    args = dict(meta["args"])
    args["iteration"] = meta.get("iteration", args.get("iteration", 0))
    return args


def _deep_update(base, overlay):
    for key, value in overlay.items():
        if (key in base and isinstance(base[key], dict)
                and isinstance(value, dict)):
            _deep_update(base[key], value)
        else:
            base[key] = value
    return base


def restore_state(checkpoint_path, target_state):
    """Restore a TrainState from a checkpoint given a same-structure target.

    Structure-tolerant like the reference loader (``utils/utils.py:349-372``):
    saved leaves overwrite the target's; subtrees absent from the checkpoint
    (e.g. empty batch_stats) keep the target's initialization.
    """
    nested = load_arrays(checkpoint_path)
    base = serialization.to_state_dict(target_state)
    merged = _deep_update(base, nested)
    return serialization.from_state_dict(target_state, merged)


def latest_checkpoint(experiment_dir):
    ckpt_dir = Path(experiment_dir) / "checkpoints"
    if not ckpt_dir.exists():
        return None
    candidates = sorted(p for p in ckpt_dir.iterdir()
                        if p.name.startswith("model_"))
    return candidates[-1] if candidates else None
