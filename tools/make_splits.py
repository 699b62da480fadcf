#!/usr/bin/env python3
"""Generate train/val split CSVs from a preprocessed dataset tree.

The reference ships VoxCeleb2 split CSVs (``data/splits/train.csv`` /
``val.csv``: a 'path' column of identity/video directories).  To reuse the
exact official protocol, copy those files; this tool regenerates splits for
any dataset tree laid out as ``<data_root>/<img_dir>/<identity>/<video>/``.

Usage:
    python tools/make_splits.py --data_root /data/VoxCeleb2 \
        --img_dir images-cropped --val_fraction 0.005 --out_dir data/splits
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=Path, required=True)
    parser.add_argument("--img_dir", type=str, default="images-cropped")
    parser.add_argument("--out_dir", type=Path, default=Path("data/splits"))
    parser.add_argument("--val_fraction", type=float, default=0.005)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    base = args.data_root / args.img_dir
    paths = []
    for identity in sorted(p for p in base.iterdir() if p.is_dir()):
        videos = sorted(p for p in identity.iterdir() if p.is_dir())
        if videos:
            paths += [str(v.relative_to(base)) for v in videos]
        else:
            paths.append(str(identity.relative_to(base)))

    rng = random.Random(args.seed)
    rng.shuffle(paths)
    n_val = max(1, int(len(paths) * args.val_fraction))
    val, train = paths[:n_val], paths[n_val:]

    args.out_dir.mkdir(parents=True, exist_ok=True)
    for name, rows in (("train.csv", sorted(train)), ("val.csv",
                                                      sorted(val))):
        with open(args.out_dir / name, "w") as f:
            f.write("Unnamed: 0,path\n")
            for i, row in enumerate(rows):
                f.write(f"{i},{row}\n")
        print(f"wrote {args.out_dir / name} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
