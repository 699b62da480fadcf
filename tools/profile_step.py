#!/usr/bin/env python3
"""Profile a train or drive step with jax.profiler.

Writes a trace viewable with TensorBoard's profile plugin:
    python tools/profile_step.py --mode drive --out /tmp/lpt_trace
    tensorboard --logdir /tmp/lpt_trace

(Training runs can instead pass --profile_dir to train.py — the loop traces
a few early steps automatically.)
"""

from __future__ import annotations

import argparse
import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def flagship_args(**over):
    args = types.SimpleNamespace(
        image_size=256, in_channels=3, out_channels=3, num_channels=64,
        max_num_channels=512, embed_channels=512, pose_embedding_size=256,
        gen_padding="zero", gen_constant_input_size=4,
        gen_num_residual_blocks=2, norm_layer="in", dis_padding="zero",
        dis_num_blocks=7, num_labels=1, optimizer="RAdam", lr_gen=5e-4,
        lr_dis=8e-4, beta1=0.0, average_function="sum", finetune=True,
        iteration=0, set_eval_mode_in_train=False, batch_size=8,
        random_seed=0, gan_type="gan", fm_weight=10.0, dice_weight=1.0,
        perc_weight=3e-2, idt_embed_weight=0.6e-2, vgg_weights_dir="",
        allow_random_vgg=True,  # profiling measures FLOPs, not fidelity
        use_pixelwise_augs=True, use_affine_scale=True,
        use_affine_shift=True, compute_dtype="bfloat16")
    for k, v in over.items():
        setattr(args, k, v)
    return args


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["drive", "finetune"],
                        default="drive")
    parser.add_argument("--out", default="/tmp/lpt_trace")
    parser.add_argument("--batch", type=int, default=0)
    parser.add_argument("--steps", type=int, default=5)
    args_cli = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from latentpose_tpu.models.embedders import \
        unsupervised_pose_separate_embResNeXt_segmentation as emb_mod
    from latentpose_tpu.models.generators import \
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod

    args = flagship_args()
    rng = jax.random.PRNGKey(0)

    if args_cli.mode == "drive":
        batch = args_cli.batch or 128
        embedder = emb_mod.Wrapper.get_net(args)
        generator = gen_mod.Wrapper.get_net(args)
        emb_vars = embedder.init(rng, jnp.zeros((1, 1, 256, 256, 3)),
                                 jnp.zeros((1, 1, 256, 256, 3)))
        gen_vars = generator.init(
            rng, {"embeds": jnp.zeros((1, 512)),
                  "pose_embedding": jnp.zeros((1, 256))})
        identity = jax.random.normal(rng, (1, 512))
        cd = jnp.bfloat16

        @jax.jit
        def step(frames):
            pose = embedder.apply(emb_vars, frames.astype(cd)[:, None],
                                  train=False,
                                  method="get_pose_embedding")
            idt = jnp.broadcast_to(identity, (frames.shape[0], 512))
            rgbs, _ = generator.apply(
                gen_vars, {"embeds": idt.astype(cd),
                           "pose_embedding": pose.astype(cd)},
                update_stats=False)
            return rgbs

        x = jax.device_put(
            np.random.rand(batch, 256, 256, 3).astype(np.float32))
        step(x).block_until_ready()  # compile outside the trace
        with jax.profiler.trace(args_cli.out):
            for _ in range(args_cli.steps):
                out = step(x)
            out.block_until_ready()
    else:
        batch = args_cli.batch or 8
        from latentpose_tpu.losses import (adversarial, dice, featmat,
                                           idt_embed, perceptual)
        from latentpose_tpu.models.discriminators import \
            no_landmarks as dis_mod
        from latentpose_tpu.runners import build, holycow
        args.batch_size = batch
        models = {"embedder": emb_mod.Wrapper.get_net(args),
                  "generator": gen_mod.Wrapper.get_net(args),
                  "discriminator": dis_mod.Wrapper.get_net(args)}
        criteria = [adversarial.Criterion("gan"), featmat.Criterion(10.0),
                    dice.Criterion(1.0), idt_embed.Wrapper.get_net(args),
                    perceptual.Wrapper.get_net(args)]
        opt_g, opt_d = build.build_optimizers(
            args, {"discriminators": dis_mod})
        state = build.init_train_state(
            args, models, opt_g, opt_d, rng, finetune=True,
            finetune_embedding=jnp.ones((1, 512)) * 0.1)
        step_fn = holycow.make_train_step(models, criteria, args, opt_g,
                                          opt_d)
        rnd = np.random.RandomState(0)
        batch_data = {
            "enc_rgbs": rnd.rand(batch, 1, 256, 256, 3).astype(np.float32),
            "pose_input_rgbs": rnd.rand(batch, 1, 256, 256,
                                        3).astype(np.float32),
            "target_rgbs": rnd.rand(batch, 1, 256, 256,
                                    3).astype(np.float32),
            "real_segm": rnd.rand(batch, 1, 256, 256, 1).astype(np.float32),
            "label": np.zeros(batch, np.int32),
        }
        s, _ = step_fn(state, batch_data, rng)
        jax.block_until_ready(s.params)
        with jax.profiler.trace(args_cli.out):
            for i in range(args_cli.steps):
                s, _ = step_fn(s, batch_data, jax.random.fold_in(rng, i))
            jax.block_until_ready(s.params)

    print(f"trace written to {args_cli.out}")


if __name__ == "__main__":
    main()
