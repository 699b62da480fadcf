"""Experiment logging (L8 observability).

Parity goals with reference ``utils/tensorboard_logging.py``:
- ``setup_logging`` creates ``experiments_dir/experiment_name`` with a
  ``checkpoints/`` subdir; the experiment auto-name is built from
  non-default args + timestamp (reference ``get_postfix``, ``:47-54``);
- the writer pauses image/scalar writes when free disk < 1 GiB
  (reference ``:18-27``);
- ``add_image`` stores a single-column grid with captions.

Backend: TensorBoard (tensorboardX) if importable, else a JSONL scalar log +
PNG image dumps — same information, zero extra deps.
"""

from __future__ import annotations

import json
import logging
import shutil
import time
from pathlib import Path

import numpy as np

logger = logging.getLogger("latentpose_tpu.logging")

try:
    from tensorboardX import SummaryWriter as _TBWriter
except ImportError:
    _TBWriter = None

_MIN_FREE_BYTES = 1 << 30  # 1 GiB, reference tensorboard_logging.py:18-27


def _disk_ok(path):
    try:
        return shutil.disk_usage(str(path)).free >= _MIN_FREE_BYTES
    except OSError:
        return True


def get_postfix(args_dict, default_args_dict, args_to_ignore,
                delimiter="__"):
    """Reference ``tensorboard_logging.get_postfix`` exactly: sorted
    ``arg^value`` pairs for every non-default, non-ignored arg, joined by
    ``__``, with ``/`` mapped to ``+`` (``tensorboard_logging.py:47-54``).
    A key absent from the defaults counts as non-default."""
    s = []
    for arg in sorted(args_dict.keys()):
        if arg in args_to_ignore:
            continue
        if arg in default_args_dict \
                and default_args_dict[arg] == args_dict[arg]:
            continue
        s.append(f"{arg}^{args_dict[arg]}")
    return delimiter.join(s).replace("/", "+")


def get_experiment_name(args, default_args, args_to_ignore):
    """Auto-name from non-default args + timestamp (reference
    ``setup_logging``, ``tensorboard_logging.py:57-61``)."""
    if getattr(args, "experiment_name", ""):
        return args.experiment_name
    postfix = get_postfix(vars(args),
                          vars(default_args) if default_args else {},
                          args_to_ignore)
    return time.strftime(f"%m-%d_%H-%M___{postfix}")


class ExperimentWriter:
    def __init__(self, experiment_dir):
        self.experiment_dir = Path(experiment_dir)
        self.experiment_dir.mkdir(parents=True, exist_ok=True)
        (self.experiment_dir / "checkpoints").mkdir(exist_ok=True)
        self._tb = None
        if _TBWriter is not None:
            self._tb = _TBWriter(logdir=str(self.experiment_dir))
        self._scalar_file = open(self.experiment_dir / "scalars.jsonl", "a")
        self._images_dir = self.experiment_dir / "images"
        self._images_dir.mkdir(exist_ok=True)

    def add_scalar(self, tag, value, step):
        if not _disk_ok(self.experiment_dir):
            return
        value = float(value)
        self._scalar_file.write(
            json.dumps({"tag": tag, "value": value, "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def flush(self):
        self._scalar_file.flush()
        if self._tb is not None:
            self._tb.flush()

    def add_image(self, tag, image, captions, step):
        """image: (H, W, 3) float in [0, 1] (already grid-assembled)."""
        if not _disk_ok(self.experiment_dir):
            return
        arr = np.clip(np.asarray(image), 0.0, 1.0)
        arr8 = (arr * 255).astype(np.uint8)
        name = tag.replace("/", "_")
        out = self._images_dir / f"{name}_{int(step):08d}.png"
        try:
            import cv2
            cv2.imwrite(str(out), arr8[..., ::-1])
        except ImportError:
            from PIL import Image
            Image.fromarray(arr8).save(out)
        if captions:
            with open(out.with_suffix(".txt"), "w") as f:
                f.write("\n".join(map(str, captions)))
        if self._tb is not None:
            self._tb.add_image(tag, arr.transpose(2, 0, 1), step)

    def close(self):
        self._scalar_file.close()
        if self._tb is not None:
            self._tb.close()


def setup_logging(args, default_args, args_to_ignore):
    name = get_experiment_name(args, default_args, args_to_ignore)
    experiment_dir = Path(args.experiments_dir) / name
    writer = ExperimentWriter(experiment_dir)
    logger.info("Logging experiment to %s", experiment_dir)
    return str(experiment_dir), writer
