"""LPIPS (Learned Perceptual Image Patch Similarity, Zhang et al. 2018) —
the metric the ≤1e-3 output-fidelity target names (BASELINE.md).

Architecture (richzhang/PerceptualSimilarity v0.1, net='alex'):
- inputs scaled to [-1, 1], then channel-normalized by the fixed
  ImageNet-ish shift/scale constants of the ScalingLayer;
- AlexNet ``features`` tower, tapping the 5 post-ReLU maps
  (64/192/384/256/256 channels);
- each tap unit-normalized along channels;
- squared difference -> per-layer learned 1x1 'lin' head (non-negative
  weights) -> spatial mean -> sum over the 5 layers.

Weight-gated like every pretrained tower in this repo: the real numbers
need ``lpips_alex.npz`` converted from the official weights
(``tools/convert_torch_weights.py lpips`` — see WEIGHTS.md); without the
file a deterministic random tower keeps the code path testable but is NOT
the LPIPS metric, and callers are told so.

The reference repo has no LPIPS code — this exists for the rebuild's
output-parity harness (tools/compare_outputs.py).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

logger = logging.getLogger("latentpose_tpu.lpips")

# ScalingLayer constants (PerceptualSimilarity lpips/lpips.py ScalingLayer)
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet features plan: (out_ch, kernel, stride, pad, maxpool_before)
_ALEX_PLAN = (
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)
ALEX_CHANNELS = tuple(p[0] for p in _ALEX_PLAN)

WEIGHTS_FILE = "lpips_alex.npz"


def load_lpips_params(weights_dir, allow_random=False):
    """Load converted LPIPS weights; deterministic random fallback only
    with ``allow_random`` (testing).  Returns (params, armed: bool)."""
    path = Path(weights_dir or "") / WEIGHTS_FILE
    if path.is_file():
        flat = dict(np.load(str(path)))
        params = {}
        for i in range(len(_ALEX_PLAN)):
            params[f"conv{i}"] = {
                "kernel": jnp.asarray(flat[f"conv{i}/kernel"]),
                "bias": jnp.asarray(flat[f"conv{i}/bias"]),
            }
            params[f"lin{i}"] = jnp.asarray(flat[f"lin{i}/weight"])
        return params, True
    if not allow_random:
        raise FileNotFoundError(
            f"LPIPS weights not found at {path} — convert the official "
            f"PerceptualSimilarity v0.1 alex weights with "
            f"`python tools/convert_torch_weights.py lpips "
            f"ALEX_PTH:LIN_PTH {Path(weights_dir or '.')}` (see "
            f"WEIGHTS.md), or pass allow_random for a NON-LPIPS test tower")
    logger.warning(
        "LPIPS: no weights under %r — deterministic RANDOM tower "
        "(testing only; the number produced is not LPIPS)", weights_dir)
    rng = np.random.RandomState(0)
    params = {}
    in_ch = 3
    for i, (out_ch, k, _s, _p, _pool) in enumerate(_ALEX_PLAN):
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(
                rng.randn(k, k, in_ch, out_ch).astype(np.float32)
                * np.sqrt(2.0 / (k * k * in_ch))),
            "bias": jnp.zeros((out_ch,), jnp.float32),
        }
        params[f"lin{i}"] = jnp.asarray(
            np.abs(rng.randn(out_ch)).astype(np.float32) / out_ch)
        in_ch = out_ch
    return params, False


def _maxpool_3x3s2(x):
    # torch MaxPool2d(3, 2): floor mode, no padding == VALID
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _alex_features(params, x):
    """x: (B, H, W, 3) in LPIPS-normalized space -> 5 post-ReLU taps."""
    taps = []
    h = x
    for i, (_out, _k, stride, pad, pool) in enumerate(_ALEX_PLAN):
        if pool:
            h = _maxpool_3x3s2(h)
        h = jax.lax.conv_general_dilated(
            h, params[f"conv{i}"]["kernel"],
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + params[f"conv{i}"]["bias"]
        h = jax.nn.relu(h)
        taps.append(h)
    return taps


def lpips(params, a, b):
    """LPIPS distance per pair.  a, b: (B, H, W, 3) float RGB in [0, 1].

    Follows PerceptualSimilarity's forward exactly: scale to [-1, 1],
    ScalingLayer, AlexNet taps, channel unit-normalization (eps 1e-10 added
    to the norm), squared diff, 1x1 lin heads, spatial mean, sum."""
    def prep(x):
        x = x.astype(jnp.float32) * 2.0 - 1.0
        return (x - LPIPS_SHIFT) / LPIPS_SCALE

    taps_a = _alex_features(params, prep(a))
    taps_b = _alex_features(params, prep(b))
    total = 0.0
    for i, (fa, fb) in enumerate(zip(taps_a, taps_b)):
        def unit(f):
            norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
            return f / (norm + 1e-10)
        diff2 = (unit(fa) - unit(fb)) ** 2
        w = jnp.maximum(params[f"lin{i}"], 0.0)  # lins are non-negative
        total = total + jnp.mean(jnp.sum(diff2 * w, axis=-1), axis=(1, 2))
    return total


def lpips_fn(weights_dir, allow_random=False):
    """(jitted distance fn, armed) — armed=False means random tower."""
    params, armed = load_lpips_params(weights_dir, allow_random)
    return jax.jit(lambda a, b: lpips(params, a, b)), armed
