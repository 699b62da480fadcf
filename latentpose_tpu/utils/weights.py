"""Converted-pretrained-weight discovery.

The reference treats its pretrained files as load-bearing downloads and
fails loudly when they are absent (e.g. ``criterions/common/perceptual_loss.py``
torch.load()s ``vgg19-d01eb7cb.pth`` unconditionally).  We mirror that:
components that need converted ``.npz`` weights search, in order,

1. the explicit directory the caller passed (``--vgg_weights_dir`` /
   ``--eval_weights_dir``),
2. ``$LATENTPOSE_WEIGHTS_DIR``,
3. ``<repo>/weights/``,

and hard-error when the file is missing unless the caller opted into the
degraded mode (``--allow_random_vgg`` / ``--allow_proxy_eval``).  See
WEIGHTS.md for one-command acquisition + conversion recipes.
"""

from __future__ import annotations

import os
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[2]


def find_weights_file(filename: str, explicit_dir=None):
    """Return the path to a converted weights file, or None if absent."""
    candidates = []
    if explicit_dir:
        candidates.append(Path(explicit_dir) / filename)
    env_dir = os.environ.get("LATENTPOSE_WEIGHTS_DIR")
    if env_dir:
        candidates.append(Path(env_dir) / filename)
    candidates.append(_REPO_ROOT / "weights" / filename)
    for cand in candidates:
        if cand.exists():
            return str(cand)
    return None


def load_flat_npz_variables(path_or_dict):
    """Flat converted-weights npz -> flax ``variables`` dict.

    Accepted key formats (all produced by tools/convert_torch_weights.py or
    tools/onnx_extract.py):

    - ``params/a/b/kernel`` / ``batch_stats/a/b/mean`` — explicit collection
      prefix, arbitrary nesting depth;
    - ``a/b/bn1__mean`` / ``…__var`` — batch_stats spelled with the ``__``
      suffix convention (keeps one flat namespace per file);
    - ``a/b/kernel`` — no collection prefix: implied ``params``.
    """
    import numpy as np

    flat = path_or_dict
    if not isinstance(flat, dict):
        raw = np.load(path_or_dict)
        flat = {k: raw[k] for k in raw.files}

    variables = {}

    def insert(collection, parts, leaf, value):
        node = variables.setdefault(collection, {})
        for part in parts:
            node = node.setdefault(part, {})
        node[leaf] = value

    for key, value in flat.items():
        if key.endswith("__mean") or key.endswith("__var"):
            path, leaf = key.rsplit("__", 1)
            parts = path.split("/")
            insert("batch_stats", parts, leaf, value)
            continue
        parts = key.split("/")
        if parts[0] in ("params", "batch_stats"):
            insert(parts[0], parts[1:-1], parts[-1], value)
        else:
            insert("params", parts[:-1], parts[-1], value)
    return variables


def missing_weights_error(filename: str, component: str, opt_in_flag: str,
                          explicit_dir=None) -> FileNotFoundError:
    return FileNotFoundError(
        f"{component}: converted weights file {filename!r} not found "
        f"(searched: explicit dir {explicit_dir!r}, $LATENTPOSE_WEIGHTS_DIR, "
        f"{_REPO_ROOT / 'weights'}). This component is NOT paper-parity "
        f"without real weights; see WEIGHTS.md for the acquisition + "
        f"conversion recipe, or pass {opt_in_flag} to knowingly run the "
        f"degraded fallback (tests/synthetic configs only).")
