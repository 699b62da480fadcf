#!/usr/bin/env python3
"""Output-parity harness: compare two sets of rendered frames
(ours vs the reference implementation's) — the workflow for the
"≤1e-3 LPIPS delta" target (BASELINE.md).

Usage:
    python tools/compare_outputs.py DIR_OR_MP4_A DIR_OR_MP4_B \
        [--vgg_weights_dir data/weights]

Reports per-frame L1, PSNR, the TRUE LPIPS (AlexNet taps + learned linear
calibration heads, eval/lpips.py — the metric the ≤1e-3 target names; needs
lpips_alex.npz per WEIGHTS.md, random-tower fallback is labeled non-LPIPS),
and a VGG-perceptual distance (the caffe-VGG19 feature metric the training
loss uses).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_frames(path):
    import cv2
    path = Path(path)
    frames = []
    if path.is_dir():
        for p in sorted(path.iterdir()):
            if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp"):
                frames.append(cv2.imread(str(p))[..., ::-1])
    else:
        cap = cv2.VideoCapture(str(path))
        while True:
            ok, img = cap.read()
            if not ok:
                break
            frames.append(img[..., ::-1])
        cap.release()
    return [f.astype(np.float32) / 255.0 for f in frames]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("a")
    parser.add_argument("b")
    parser.add_argument("--vgg_weights_dir", default="data/weights")
    parser.add_argument("--allow_random_vgg", action="store_true",
                        help="Permit a random perceptual tower (distance "
                             "still valid as a metric, not LPIPS-parity)")
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args(argv)

    frames_a = load_frames(args.a)
    frames_b = load_frames(args.b)
    n = min(len(frames_a), len(frames_b))
    assert n > 0, "no frames"
    if len(frames_a) != len(frames_b):
        print(f"WARNING: frame-count mismatch ({len(frames_a)} vs "
              f"{len(frames_b)}); comparing first {n}")

    import jax.numpy as jnp
    from latentpose_tpu.eval.lpips import lpips_fn
    from latentpose_tpu.losses.common.perceptual_loss import PerceptualLoss
    perc = PerceptualLoss(weight=1.0, vgg_weights_dir=args.vgg_weights_dir,
                          net="caffe", allow_random=args.allow_random_vgg)
    lpips_d, lpips_armed = lpips_fn(args.vgg_weights_dir,
                                    allow_random=args.allow_random_vgg)

    l1s, psnrs, percs, lpipses = [], [], [], []
    for start in range(0, n, args.batch):
        a = np.stack(frames_a[start:start + args.batch])
        b = np.stack(frames_b[start:start + args.batch])
        if a.shape != b.shape:
            import cv2
            b = np.stack([cv2.resize(x, a.shape[2:0:-1]) for x in b])
        l1s.append(np.abs(a - b).mean())
        mse = ((a - b) ** 2).mean()
        psnrs.append(-10 * np.log10(max(mse, 1e-10)))
        percs.append(float(perc(jnp.asarray(a), jnp.asarray(b))))
        lpipses.append(
            float(np.mean(lpips_d(jnp.asarray(a), jnp.asarray(b)))))

    print(f"frames: {n}")
    print(f"L1: {np.mean(l1s):.6f}")
    print(f"PSNR: {np.mean(psnrs):.2f} dB")
    print(f"LPIPS: {np.mean(lpipses):.6f}"
          + ("" if lpips_armed
             else "  (RANDOM tower — NOT LPIPS; convert weights per "
                  "WEIGHTS.md `lpips` entry)"))
    print(f"VGG-perceptual distance: {np.mean(percs):.6f}"
          + ("" if (Path(args.vgg_weights_dir) / "vgg19_caffe.npz").exists()
             else "  (RANDOM tower — convert vgg19 weights for a "
                  "calibrated number)"))
    return {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs)),
            "lpips": float(np.mean(lpipses)),
            "lpips_armed": bool(lpips_armed),
            "vgg": float(np.mean(percs))}


if __name__ == "__main__":
    main()
