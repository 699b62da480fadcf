"""Wall-clock for the 230-iteration avatar fine-tune (BASELINE.md target:
< 60 s on a v4-8; the reference fine-tunes 125-560 iterations on one GPU).

Builds the real fine-tune step (RAdam, EMA alpha 0.972, finetune_embedding
+ 1-row discriminator W, all 5 fine-tune losses — finetuning-base.yaml
drops dis_embed) at batch 8 / 256² bf16 and times 230 iterations,
reporting compile and steady-state separately.

    python tools/bench_finetune.py [--iters 230]
"""

from __future__ import annotations

import argparse
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import numpy as np

    from latentpose_tpu.losses import (adversarial, dice, featmat,
                                       idt_embed, perceptual)
    from latentpose_tpu.models.discriminators import no_landmarks as dis_mod
    from latentpose_tpu.models.embedders import (
        unsupervised_pose_separate_embResNeXt_segmentation as emb_mod)
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)
    from latentpose_tpu.runners import build, finetune as ft, holycow

    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=230)
    parser.add_argument("--batch", type=int, default=8)
    cli = parser.parse_args()
    batch = cli.batch

    args = types.SimpleNamespace(
        image_size=256, in_channels=3, out_channels=3, num_channels=64,
        max_num_channels=512, embed_channels=512, pose_embedding_size=256,
        gen_padding="zero", gen_constant_input_size=4,
        gen_num_residual_blocks=2, norm_layer="in", dis_padding="zero",
        dis_num_blocks=7, num_labels=1, optimizer="RAdam", lr_gen=5e-4,
        lr_dis=8e-4, beta1=0.0, average_function="sum", finetune=True,
        iteration=0, set_eval_mode_in_train=False, batch_size=batch,
        random_seed=0, gan_type="gan", fm_weight=10.0, dice_weight=1.0,
        perc_weight=3e-2, idt_embed_weight=0.6e-2,
        vgg_weights_dir="", allow_random_vgg=True,
        compute_dtype="bfloat16")

    models = {"embedder": emb_mod.Wrapper.get_net(args),
              "generator": gen_mod.Wrapper.get_net(args),
              "discriminator": ft.make_finetune_discriminator(
                  dis_mod.Wrapper, args)}
    criteria = [idt_embed.Wrapper.get_net(args),
                perceptual.Wrapper.get_net(args),
                adversarial.Criterion(args.gan_type),
                featmat.Criterion(args.fm_weight),
                dice.Criterion(args.dice_weight)]
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": dis_mod})
    rng = jax.random.PRNGKey(0)
    state = build.init_train_state(args, models, opt_g, opt_d, rng,
                                   finetune=True)
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d,
                                      donate=True)

    rnd = np.random.RandomState(0)
    batch_data = jax.device_put({
        "pose_input_rgbs": rnd.rand(batch, 1, 256, 256,
                                    3).astype(np.float32),
        "target_rgbs": rnd.rand(batch, 1, 256, 256, 3).astype(np.float32),
        "real_segm": rnd.rand(batch, 1, 256, 256, 1).astype(np.float32),
        "label": np.zeros((batch,), np.int32),
    })

    t0 = time.perf_counter()
    state, _ = step_fn(state, batch_data, rng)
    jax.block_until_ready(state.params)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(cli.iters - 1):
        state, _ = step_fn(state, batch_data, jax.random.fold_in(rng, i))
    jax.block_until_ready(state.params)
    steady_s = time.perf_counter() - t0

    per_step = steady_s / (cli.iters - 1) * 1e3
    print(f"fine-tune: compile {compile_s:.1f} s, "
          f"{cli.iters} iters in {compile_s + steady_s:.1f} s total "
          f"({per_step:.1f} ms/step steady-state, 1 chip)")


if __name__ == "__main__":
    main()
