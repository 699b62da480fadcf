"""PSNR of the int8 drive path vs the exact path at flagship scale.

Random-init flagship generator at 256² (weights are random, which is the
HARD case for quantization — trained GAN weights are smoother), identical
inputs, PSNR over the rendered RGB in the generator's output range.

    python tools/check_int8_quality.py
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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

    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        inp = {k: v.astype(dt) for k, v in inputs.items()}
        rgb, _ = gen.apply(variables, inp, update_stats=False)
        rgb_q, _ = gen_q.apply(variables, inp, update_stats=False)
        rgb = np.asarray(rgb, np.float32)
        rgb_q = np.asarray(rgb_q, np.float32)
        mse = float(np.mean((rgb - rgb_q) ** 2))
        # output range is 1.5 wide ((-0.25, 1.25))
        psnr = 10 * np.log10(1.5 ** 2 / max(mse, 1e-12))
        print(f"exact-{name} vs int8-{name} @ 256²: PSNR {psnr:.1f} dB, "
              f"max|err| {np.max(np.abs(rgb - rgb_q)):.4f}")


if __name__ == "__main__":
    main()
