"""Full-size reference-checkpoint conversion dress rehearsal (VERDICT r2
Next #10).

The real released ``model_*.pth`` files are unobtainable here (zero egress —
WEIGHTS.md), so this rehearses the whole real-checkpoint-day pipeline with a
FABRICATED checkpoint at FULL flagship size (256², all channel widths,
EMA copies, both optimizers, args Namespace — reference
``utils/utils.py:251-398`` save format):

    fabricate model_*.pth -> convert (tools/convert_torch_weights.py
    checkpoint) -> fine-tune via the production train CLI (checkpoint-args
    merge + ê init + finetune transition) -> drive -> mp4.

When a real checkpoint arrives, the only untested delta is the numbers in
the tensors.
"""

import json
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_full_size_reference_checkpoint_round_trip(tmp_path):
    from convert_torch_weights import convert_reference_checkpoint
    from fabricate_reference_checkpoint import fabricate

    pth = fabricate(tmp_path / "model_00001000.pth", image_size=256,
                    num_labels=100, iteration=1000, seed=0)
    converted = tmp_path / "converted"
    convert_reference_checkpoint(pth, converted)

    # --- the converted checkpoint is structurally complete ---------------
    meta = json.loads((converted / "meta.json").read_text())
    assert meta["iteration"] == 1000
    assert meta["args"]["image_size"] == 256
    assert meta["args"]["num_channels"] == 64
    assert meta["finetune"] is False
    with np.load(converted / "arrays.npz") as raw:
        keys = set(raw.files)
    for probe in (
            # embedder: ResNeXt grouped conv + BN stats, MobileNetV2 head
            "params::embedder::identity_encoder::layer4_2::conv2::kernel",
            "batch_stats::embedder::identity_encoder::bn1::mean",
            "params::embedder::pose_encoder::classifier::kernel",
            # generator: full 8-block decoder + head + projector + SN state
            "params::generator::block7::conv1::kernel",
            "params::generator::head_conv::kernel",
            "spectral::generator::projector_1::u",
            # discriminator: stem + 6 blocks + projection embed
            "params::discriminator::block5::conv0::kernel",
            "params::discriminator::embed::embedding",
            # EMA copies travel too
            "ema_params::generator::block0::conv0::kernel",
            "ema_params::embedder::identity_encoder::conv1::kernel"):
        assert probe in keys, probe
    # full flagship shapes, not a shrunken stand-in
    with np.load(converted / "arrays.npz") as raw:
        assert raw["params::generator::constant"].shape == (1, 4, 4, 512)
        assert raw[
            "params::embedder::identity_encoder::fc::kernel"
        ].shape == (2048, 512)
        assert raw[
            "params::discriminator::embed::embedding"].shape == (100, 512)

    # --- fine-tune through the production CLI (checkpoint-args merge,
    #     ê-averaging, finetune re-parameterization, optimizer re-init) ----
    from latentpose_tpu.cli.train import main as train_main
    state = train_main([
        "--checkpoint_path", str(converted),
        "--finetune",
        "--dataloader", "synthetic",
        "--synthetic_frames_per_video", "2", "--num_enc_frames", "2",
        "--criterions", "adversarial, featmat, dice", "--metrics", "",
        "--batch_size", "1", "--num_epochs", "1", "--num_devices", "1",
        "--log_frequency_images", "9999",
        "--log_frequency_fixed_images", "9999",
        "--experiments_dir", str(tmp_path), "--experiment_name", "ft",
    ])
    # resolution level 2: full flagship geometry came from the CHECKPOINT
    # args (nothing above passed image_size/num_channels/...)
    assert state.params["finetune_embedding"].shape[-1] == 512
    ft_ckpts = sorted((tmp_path / "ft" / "checkpoints").iterdir())
    assert ft_ckpts

    # --- drive the converted-then-fine-tuned avatar -----------------------
    pytest.importorskip("cv2")
    from latentpose_tpu.cli.drive import main as drive_main

    # tiny driver dir (synthetic:// drives 32 frames — too slow at full
    # 256² on the CPU test runner)
    import cv2
    from latentpose_tpu.data.synthetic import render_face
    driver_dir = tmp_path / "driver"
    driver_dir.mkdir()
    for f in range(2):
        img, _ = render_face(7, f, 256)
        cv2.imwrite(str(driver_dir / f"{f:05d}.jpg"),
                    (img[..., ::-1] * 255).astype(np.uint8))

    videos = drive_main([
        str(ft_ckpts[-1]),
        "--images_paths", str(driver_dir),
        "--destination", str(tmp_path / "driving"),
        "--drive_batch_size", "2", "--compute_dtype", "float32",
    ])
    out = Path(videos[0])
    assert out.exists() and out.stat().st_size > 0
    cap = cv2.VideoCapture(str(out))
    ok, frame = cap.read()
    cap.release()
    assert ok
    # side-by-side driver|result at full 256²
    assert frame.shape[0] == 256 and frame.shape[1] == 512
    assert np.isfinite(frame.astype(np.float32)).all()


def test_fabricated_finetuned_checkpoint_converts(tmp_path):
    """Fine-tuned reference checkpoints carry ``identity_embedding`` and a
    1-row discriminator W (reference ``:110-136``); the converter must map
    them to ``finetune_embedding`` + a loadable drive state.  Small size —
    the full-size meta path is covered by the slow test above."""
    from convert_torch_weights import convert_reference_checkpoint
    from fabricate_reference_checkpoint import fabricate

    pth = fabricate(tmp_path / "model_00001230.pth", image_size=256,
                    iteration=1230, seed=3, finetune=True)
    converted = tmp_path / "converted_ft"
    convert_reference_checkpoint(pth, converted)

    meta = json.loads((converted / "meta.json").read_text())
    assert meta["finetune"] is True
    with np.load(converted / "arrays.npz") as raw:
        assert raw["params::finetune_embedding"].shape == (1, 512)
        assert raw["params::discriminator::embed::embedding"
                   ].shape == (1, 512)
        assert "ema_params::finetune_embedding" in raw.files
