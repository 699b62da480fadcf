"""drive --crop: raw (uncropped) footage is cropped inline exactly as the
inference dataloader would (reference ``drive.py:73-98`` + its dataset's
bbox-npy crop), so users can drive raw frames end-to-end."""

import types
from pathlib import Path

import numpy as np
import pytest


def _make_raw_sequence(tmp_path, canvas=96, face=48, offset=(24, 16),
                       n_frames=6):
    """Synthetic faces pasted into a larger canvas + the bbox .npy dict
    (dataset contract: bboxes[identity][sequence][frame_id] = LTRB in
    256-scale of the source image)."""
    import cv2

    from latentpose_tpu.data.synthetic import render_face

    seq_dir = tmp_path / "raw" / "idA" / "seq1"
    seq_dir.mkdir(parents=True)
    oy, ox = offset
    for f in range(n_frames):
        img, _ = render_face(3, f, face)
        canvas_img = np.full((canvas, canvas, 3), 0.2, np.float32)
        canvas_img[oy:oy + face, ox:ox + face] = img
        cv2.imwrite(str(seq_dir / f"{f:05d}.jpg"),
                    (canvas_img[..., ::-1] * 255).astype(np.uint8))

    scale = 256.0 / canvas
    bbox = np.array([ox, oy, ox + face, oy + face], np.float32) * scale
    bboxes = {"idA": {"seq1": {f: bbox for f in range(n_frames)}}}
    bbox_path = tmp_path / "bboxes.npy"
    np.save(bbox_path, bboxes, allow_pickle=True)
    return seq_dir, bbox_path


def test_inline_crop_centers_face(tmp_path):
    from latentpose_tpu.cli.drive import inline_crop_frames

    seq_dir, bbox_path = _make_raw_sequence(tmp_path)
    args = types.SimpleNamespace(bboxes_dir=str(bbox_path), image_size=64)
    frames = inline_crop_frames(str(seq_dir), args)
    assert frames.shape == (6, 64, 64, 3)
    assert frames.dtype == np.float32
    # the face (bright vs the 0.2 canvas) must be centered after the
    # square x1.8 crop: central half strictly brighter than the border ring
    center = frames[:, 20:44, 20:44].mean()
    border = np.concatenate([frames[:, :6].ravel(), frames[:, -6:].ravel()])
    assert center > border.mean() + 0.05


def test_inline_crop_requires_bbox_source(tmp_path):
    from latentpose_tpu.cli.drive import inline_crop_frames

    seq_dir, _ = _make_raw_sequence(tmp_path, n_frames=2)
    args = types.SimpleNamespace(bboxes_dir="/non/existent", image_size=32)
    with pytest.raises(RuntimeError, match="--crop needs per-frame bboxes"):
        inline_crop_frames(str(seq_dir), args)


@pytest.mark.slow
def test_drive_crop_end_to_end(tmp_path):
    """Fine-tune on synthetic data, then drive RAW uncropped frames with
    --crop: the inline crop path must feed the model and write an mp4."""
    from latentpose_tpu.cli.drive import main as drive_main
    from latentpose_tpu.cli.train import main as train_main

    train_main([
        "--embedder", "simple_conv",
        "--generator", "vector_pose_unsupervised_segmentation_noBottleneck",
        "--discriminator", "no_landmarks", "--runner", "holycow",
        "--image_size", "32", "--num_channels", "8",
        "--max_num_channels", "32", "--embed_channels", "32",
        "--pose_embedding_size", "16", "--dis_num_blocks", "4",
        "--dataloader", "synthetic",
        "--criterions", "adversarial, featmat, dice", "--metrics", "",
        "--batch_size", "4", "--num_devices", "1",
        "--synthetic_num_labels", "4", "--num_epochs", "1",
        "--log_frequency_images", "9999",
        "--log_frequency_fixed_images", "9999",
        "--experiments_dir", str(tmp_path), "--experiment_name", "meta",
    ])
    ckpt = sorted((tmp_path / "meta" / "checkpoints").iterdir())[-1]

    seq_dir, bbox_path = _make_raw_sequence(tmp_path, n_frames=4)
    results = drive_main([
        str(ckpt),
        "--images_paths", str(seq_dir),
        "--destination", str(tmp_path / "driving"),
        "--drive_batch_size", "4",
        "--crop", "--bboxes_dir", str(bbox_path),
    ])
    out = Path(results[0])
    assert out.exists() and out.stat().st_size > 0
