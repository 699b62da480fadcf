"""Attribute the meta-train step's in-context cost by ablation.

Component microbenches (tools/bench_train_parts.py) sum to ~85 ms while the
full step measures ~125 ms; isolated numbers mis-attribute fusion and
scheduling effects.  This times the REAL jitted step with subsets of the
criterion stack (and a no-discriminator variant), so each subsystem's
marginal in-context cost is the difference from the full step.

    python tools/bench_step_ablation.py

Validation: the adversarial-only number reproduces at 97-104 ms/step in a
100-iteration state-threaded run with advancing parameters (linear in n),
which is also consistent with the physical floor implied by the tower's
block-diagonal FLOPs.  (A few isolated re-runs have produced impossibly
fast readings — below the MXU peak-throughput floor — through the remote
execution path; treat any step time that beats the FLOP floor as a broken
measurement and re-run with more iterations.)
"""

from __future__ import annotations

import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_step(criteria_names, batch=8, k_frames=8, eval_bn=False):
    import jax

    import numpy as np

    from latentpose_tpu.losses import (adversarial, dice, dis_embed,
                                       featmat, idt_embed, perceptual)
    from latentpose_tpu.models.discriminators import no_landmarks as dis_mod
    from latentpose_tpu.models.embedders import (
        unsupervised_pose_separate_embResNeXt_segmentation as emb_mod)
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)
    from latentpose_tpu.runners import build, holycow

    args = types.SimpleNamespace(
        image_size=256, in_channels=3, out_channels=3, num_channels=64,
        max_num_channels=512, embed_channels=512, pose_embedding_size=256,
        gen_padding="zero", gen_constant_input_size=4,
        gen_num_residual_blocks=2, norm_layer="in", dis_padding="zero",
        dis_num_blocks=7, num_labels=1000, optimizer="Adam", lr_gen=5e-5,
        lr_dis=2e-4, beta1=0.0, average_function="sum", finetune=False,
        iteration=0, set_eval_mode_in_train=eval_bn, batch_size=batch,
        random_seed=0, gan_type="gan", fm_weight=10.0, dice_weight=1.0,
        perc_weight=3e-2, idt_embed_weight=0.6e-2, dis_embed_weight=1e-2,
        vgg_weights_dir="", allow_random_vgg=True,
        compute_dtype="bfloat16")

    models = {"embedder": emb_mod.Wrapper.get_net(args),
              "generator": gen_mod.Wrapper.get_net(args),
              "discriminator": dis_mod.Wrapper.get_net(args)}
    all_criteria = {
        "idt_embed": lambda: idt_embed.Wrapper.get_net(args),
        "perceptual": lambda: perceptual.Wrapper.get_net(args),
        "adversarial": lambda: adversarial.Criterion(args.gan_type),
        "featmat": lambda: featmat.Criterion(args.fm_weight),
        "dis_embed": lambda: dis_embed.Criterion(args.dis_embed_weight),
        "dice": lambda: dice.Criterion(args.dice_weight),
    }
    criteria = [all_criteria[n]() for n in criteria_names]
    opt_g, opt_d = build.build_optimizers(args, {"discriminators": dis_mod})
    rng = jax.random.PRNGKey(0)
    state = build.init_train_state(args, models, opt_g, opt_d, rng)
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d,
                                      donate=True)

    rnd = np.random.RandomState(0)
    batch_data = jax.device_put({
        "enc_rgbs": rnd.rand(batch, k_frames, 256, 256,
                             3).astype(np.float32),
        "pose_input_rgbs": rnd.rand(batch, 1, 256, 256,
                                    3).astype(np.float32),
        "target_rgbs": rnd.rand(batch, 1, 256, 256, 3).astype(np.float32),
        "real_segm": rnd.rand(batch, 1, 256, 256, 1).astype(np.float32),
        "label": (np.arange(batch) % args.num_labels).astype(np.int32),
    })
    return step_fn, state, batch_data, rng


def time_step(criteria_names, iters=10, **kw):
    import jax

    step_fn, state, batch_data, rng = build_step(criteria_names, **kw)
    state, _ = step_fn(state, batch_data, rng)
    jax.block_until_ready(state.params)
    start = time.perf_counter()
    for i in range(iters):
        state, _ = step_fn(state, batch_data, jax.random.fold_in(rng, i))
    jax.block_until_ready(state.params)
    return (time.perf_counter() - start) / iters * 1e3


def main():
    full = ["idt_embed", "perceptual", "adversarial", "featmat",
            "dis_embed", "dice"]
    variants = [
        ("FULL (6 criteria)", full),
        ("- idt_embed (VGGFace)", [c for c in full if c != "idt_embed"]),
        ("- perceptual (VGG19)", [c for c in full if c != "perceptual"]),
        ("- both VGG losses", [c for c in full
                               if c not in ("idt_embed", "perceptual")]),
        ("adversarial only", ["adversarial"]),
    ]
    results = {}
    for name, crits in variants:
        ms = time_step(crits)
        results[name] = ms
        print(f"  {name:28s} {ms:7.1f} ms", flush=True)
    # attribution probes (semantics-changing, measurement only):
    ms = time_step(["adversarial"], eval_bn=True)
    print(f"  {'adv only, eval-mode BN':28s} {ms:7.1f} ms", flush=True)
    ms = time_step(["adversarial"], k_frames=1)
    print(f"  {'adv only, K=1 enc frame':28s} {ms:7.1f} ms", flush=True)
    base = results["FULL (6 criteria)"]
    print(f"marginals vs FULL ({base:.1f} ms):")
    for name, ms in list(results.items())[1:]:
        print(f"  {name:28s} {base - ms:+7.1f} ms")


if __name__ == "__main__":
    main()
