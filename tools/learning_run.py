#!/usr/bin/env python3
"""Learning-proof run (VERDICT r2 "prove the system learns").

Runs the PRODUCTION CLIs end-to-end on the synthetic dataset with the
FLAGSHIP model family (ResNeXt-50+MobileNetV2 embedder, AdaIN generator,
projection discriminator, all six losses — VGG towers in random-weight mode
since the released .pth files are unobtainable here, see WEIGHTS.md):

1. meta-train for --iters iterations at --image_size, with realistic
   logging cadence: per-iteration scalars, cross-driving visual grids and
   deterministic fixed-probe PSNR / segmentation-IoU every
   --log_frequency iterations (EMA weights, like the reference's
   TensorBoard QC — ``holycow.py:319-387``);
2. fine-tune 230 iterations to avatar "identity 3" (reference README.md:52
   budget);
3. drive the avatar with another identity's pose sequence -> mp4;
4. write a machine-readable report (learning_report.json) + copy the
   last visual grids, for LEARNING.md.

Run on the TPU chip:  python tools/learning_run.py --out /tmp/lpr_learning
(on CPU pass --cpu; add --image_size 32 --iters 60 for a quick smoke).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def read_scalars(experiment_dir):
    rows = []
    path = Path(experiment_dir) / "scalars.jsonl"
    if path.exists():
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return rows


def series(rows, tag):
    return [(r["step"], r["value"]) for r in rows if r["tag"] == tag]


def window_mean(vals, frac_start, frac_end):
    lo = int(len(vals) * frac_start)
    hi = max(int(len(vals) * frac_end), lo + 1)
    return float(sum(vals[lo:hi]) / (hi - lo))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/lpr_learning")
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--iters", type=int, default=1600)
    ap.add_argument("--num_labels", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--log_frequency", type=int, default=100)
    ap.add_argument("--lr_gen", type=float, default=2e-4,
                    help="proof-run LR (reference meta LR 5e-5 is tuned "
                         "for 1-2M iterations; a short run needs more)")
    ap.add_argument("--lr_dis", type=float, default=4e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="reuse an existing --out/meta checkpoint instead "
                         "of re-running meta-training (recovery from a "
                         "transient tunnel failure in a later phase)")
    ns = ap.parse_args(argv)

    if ns.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from latentpose_tpu.cli.drive import main as drive_main
    from latentpose_tpu.cli.train import main as train_main

    out = Path(ns.out)
    meta_done = ns.resume and any((out / "meta" / "checkpoints").glob("*")) \
        if (out / "meta" / "checkpoints").exists() else False
    if out.exists() and not meta_done:
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)
    for stale in ("finetune", "driving"):
        if meta_done and (out / stale).exists():
            shutil.rmtree(out / stale)

    steps_per_epoch = max(1, ns.num_labels // ns.batch_size)
    num_epochs = max(1, ns.iters // steps_per_epoch)

    flagship = [
        "--embedder", "unsupervised_pose_separate_embResNeXt_segmentation",
        "--generator", "vector_pose_unsupervised_segmentation_noBottleneck",
        "--discriminator", "no_landmarks",
        "--runner", "holycow",
        "--criterions",
        "adversarial, perceptual, idt_embed, featmat, dis_embed, dice",
        "--allow_random_vgg",
        "--metrics", "psnr, segmentation_iou",
        "--image_size", str(ns.image_size),
        "--compute_dtype", "bfloat16",
        # reference-parity default augmentations (configs/default.yaml)
        "--use_pixelwise_augs", "--use_affine_scale", "--use_affine_shift",
    ]

    t0 = time.time()
    if not meta_done:
        train_main(flagship + [
            "--dataloader", "synthetic",
            "--synthetic_num_labels", str(ns.num_labels),
            "--batch_size", str(ns.batch_size),
            "--num_devices", "1",
            "--num_epochs", str(num_epochs),
            "--save_frequency", str(max(1, num_epochs // 2)),
            "--lr_gen", str(ns.lr_gen), "--lr_dis", str(ns.lr_dis),
            "--log_frequency_images", str(ns.log_frequency),
            "--log_frequency_fixed_images", str(ns.log_frequency),
            "--fixed_val_ids", "5", "--fixed_val_ids", "50",
            "--fixed_val_ids", "100",
            "--experiments_dir", str(out), "--experiment_name", "meta",
        ])
    meta_secs = time.time() - t0

    meta_dir = out / "meta"
    rows = read_scalars(meta_dir)
    report = {"meta_train_seconds": round(meta_secs, 1),
              "image_size": ns.image_size, "iters": ns.iters,
              "lr_gen": ns.lr_gen, "lr_dis": ns.lr_dis}

    loss_g = [v for _, v in series(rows, "Metrics/train/loss_G")]
    report["loss_G_first10pct"] = window_mean(loss_g, 0.0, 0.1)
    report["loss_G_last10pct"] = window_mean(loss_g, 0.9, 1.0)

    # per-term descent: the adversarial terms sit at the GAN equilibrium by
    # design (loss_G/loss_D are not monotone indicators — reference QC
    # watches reconstructions, holycow.py:319-342); the reconstruction /
    # auxiliary terms must all descend
    recon_terms = {}
    for r in rows:
        t = r["tag"]
        if (t.startswith("Metrics/train/Loss_")
                and "adversarial" not in t):
            recon_terms.setdefault(t.rsplit("/", 1)[1], []).append(
                r["value"])
    report["recon_terms"] = {
        name: {"first10pct": round(window_mean(vs, 0.0, 0.1), 5),
               "last10pct": round(window_mean(vs, 0.9, 1.0), 5)}
        for name, vs in recon_terms.items()}
    for tag in ("Fixed_metrics/train/PSNR",
                "Fixed_metrics/train/segm_IoU"):
        pts = series(rows, tag)
        key = tag.rsplit("/", 1)[1].lower()
        report[f"{key}_curve"] = [(s, round(v, 4)) for s, v in pts]
        if pts:
            report[f"{key}_first"] = round(pts[0][1], 4)
            report[f"{key}_best"] = round(max(v for _, v in pts), 4)
            report[f"{key}_last"] = round(pts[-1][1], 4)

    # --- fine-tune to one avatar (230 iterations, reference README.md:52) --
    ckpts = sorted((meta_dir / "checkpoints").iterdir())
    assert ckpts, "meta-training produced no checkpoint"
    t0 = time.time()
    train_main([
        "--config_name", "finetuning-base",
        "--dataloader", "synthetic",
        "--criterions", "adversarial, perceptual, idt_embed, featmat, dice",
        "--allow_random_vgg", "--metrics", "",
        "--checkpoint_path", str(ckpts[-1]),
        "--batch_size", "8", "--num_epochs", "230",
        # 8-image avatar: BOTH flags must say 8 — synthetic_num_labels
        # drives steps_per_epoch (num_labels // batch = 1 step/epoch, so
        # num_epochs counts ITERATIONS, the reference's 230-iter protocol);
        # without it the checkpoint-carried meta value (128) leaks in and
        # the "230-iteration" fine-tune silently runs 16x longer
        "--synthetic_num_labels", "8",
        "--synthetic_frames_per_video", "8",
        "--num_devices", "1",
        "--log_frequency_images", "99999",
        "--log_frequency_fixed_images", "99999",
        "--experiments_dir", str(out), "--experiment_name", "finetune",
    ])
    report["finetune_230it_seconds"] = round(time.time() - t0, 1)

    ft_rows = read_scalars(out / "finetune")
    ft_loss = [v for _, v in series(ft_rows, "Metrics/train/loss_G")]
    if ft_loss:
        report["finetune_loss_G_first10pct"] = window_mean(ft_loss, 0, 0.1)
        report["finetune_loss_G_last10pct"] = window_mean(ft_loss, 0.9, 1.0)

    # --- drive the avatar with ANOTHER identity's pose sequence ------------
    ft_ckpts = sorted((out / "finetune" / "checkpoints").iterdir())
    videos = drive_main([
        str(ft_ckpts[-1]),
        "--images_paths", "synthetic://7",
        "--destination", str(out / "driving"),
        "--drive_batch_size", "32",
    ])
    report["drive_outputs"] = [str(v) for v in videos]

    report["verdicts"] = {
        "all_recon_terms_descend": all(
            v["last10pct"] < v["first10pct"]
            for v in report["recon_terms"].values()),
        "psnr_improves":
            report.get("psnr_last", 0) > report.get("psnr_first", 1e9),
        "iou_improves":
            report.get("segm_iou_last", 0)
            > report.get("segm_iou_first", 1e9),
        "finetune_loss_descends":
            report.get("finetune_loss_G_last10pct", 0)
            < report.get("finetune_loss_G_first10pct", -1e9),
    }

    with open(out / "learning_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["verdicts"]))
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("_curve")}, indent=2))
    return report


if __name__ == "__main__":
    main()
