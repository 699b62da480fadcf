"""PSNR gate for the int8 drive path vs the exact path at flagship scale.

Two modes, selected automatically (VERDICT r3 item 8 — the gate re-arms
itself the moment real weights land):

- ARMED: a converted reference checkpoint is discoverable (WEIGHTS.md
  recipe #2 -> ``weights/converted_ckpt/`` or ``$LATENTPOSE_WEIGHTS_DIR``);
  the generator runs with the released trained weights (EMA copy when
  present) and the absolute quality claim is enforced: PSNR >= 40 dB or
  exit 1.
- PROXY: no checkpoint available (zero-egress build environments); the
  generator is random-initialized — the HARD case for quantization (trained
  GAN weights are smoother) — and the same 40 dB bar is applied as a
  relative regression gate, clearly labeled as not paper-parity.

    python tools/check_int8_quality.py
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PSNR_GATE_DB = 40.0


def find_trained_generator():
    """Discover a converted reference checkpoint in the standard weight
    locations (explicit env dir, then <repo>/weights/).  Returns
    (generator_params_or_None, source_string)."""
    from latentpose_tpu import checkpoint as ckpt_lib
    from latentpose_tpu.utils.weights import find_weights_file

    for name in ("converted_ckpt", "reference_ckpt"):
        path = find_weights_file(f"{name}/arrays.npz")
        if not path:
            continue
        ckpt_dir = Path(path).parent
        arrays = ckpt_lib.load_arrays(ckpt_dir)
        ema = arrays.get("ema_params") or {}
        gen = ema.get("generator") or arrays.get("params", {}).get(
            "generator")
        if gen is not None:
            src = "EMA" if ema.get("generator") is not None else "live"
            return gen, f"{ckpt_dir} ({src} generator)"
    return None, ("no converted reference checkpoint found "
                  "(see WEIGHTS.md recipe #2) — running the random-weights "
                  "proxy gate")


def main():
    import jax
    import jax.numpy as jnp

    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)

    def make(quantize):
        args = types.SimpleNamespace(
            image_size=256, out_channels=3, num_channels=64,
            max_num_channels=512, embed_channels=512,
            pose_embedding_size=256, gen_padding="zero",
            gen_constant_input_size=4, gen_num_residual_blocks=2,
            norm_layer="in", quantize="int8" if quantize else "")
        return gen_mod.Wrapper.get_net(args)

    gen, gen_q = make(False), make(True)
    rng = jax.random.PRNGKey(0)
    inputs = {"embeds": jax.random.normal(rng, (4, 512)),
              "pose_embedding": jax.random.normal(rng, (4, 256))}
    variables = gen.init(rng, inputs)

    trained_params, source = find_trained_generator()
    armed = trained_params is not None
    if armed:
        variables = {**variables, "params": trained_params}
        print(f"gate ARMED: trained weights from {source}")
    else:
        print(f"gate PROXY: {source}")

    worst = np.inf
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        inp = {k: v.astype(dt) for k, v in inputs.items()}
        rgb, _ = gen.apply(variables, inp, update_stats=False)
        rgb_q, _ = gen_q.apply(variables, inp, update_stats=False)
        rgb = np.asarray(rgb, np.float32)
        rgb_q = np.asarray(rgb_q, np.float32)
        mse = float(np.mean((rgb - rgb_q) ** 2))
        # output range is 1.5 wide ((-0.25, 1.25))
        psnr = 10 * np.log10(1.5 ** 2 / max(mse, 1e-12))
        worst = min(worst, psnr)
        print(f"exact-{name} vs int8-{name} @ 256²: PSNR {psnr:.1f} dB, "
              f"max|err| {np.max(np.abs(rgb - rgb_q)):.4f}")

    label = "paper-parity" if armed else "random-weights proxy"
    if worst < PSNR_GATE_DB:
        print(f"FAIL ({label}): int8 PSNR {worst:.1f} dB < "
              f"{PSNR_GATE_DB:.0f} dB gate")
        return 1
    print(f"PASS ({label}): int8 PSNR {worst:.1f} dB >= "
          f"{PSNR_GATE_DB:.0f} dB gate")
    return 0


if __name__ == "__main__":
    sys.exit(main())
