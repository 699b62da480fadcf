"""CLI surface tests: batched sweep drivers (dry-run), block variants."""

import numpy as np
import pytest


def test_batched_finetune_dry_run(tmp_path):
    from latentpose_tpu.cli.batched_finetune import main
    # fabricate a meta checkpoint dir + identity image folders
    ckpt = tmp_path / "exp" / "checkpoints" / "model_00000010.ckpt"
    ckpt.mkdir(parents=True)
    (ckpt / "meta.json").write_text("{}")
    img_dir = tmp_path / "data" / "images-cropped" / "id1" / "vidA" / "identity"
    img_dir.mkdir(parents=True)
    for i in range(14):
        (img_dir / f"{i:05d}.jpg").write_bytes(b"x")

    commands = main([
        "--model", str(ckpt),
        "--data_root", str(tmp_path / "data"),
        "--identities", "id1/vidA/identity",
        "--output_dir", str(tmp_path / "pup"),
        "--max_batch_size", "7",
        "--dry_run",
    ])
    assert len(commands) == 1
    cmd = commands[0]
    # batch = min(14, 7) = 7; epochs = ceil(560 / (14 // 7)) = 280
    assert cmd[cmd.index("--batch_size") + 1] == "7"
    assert cmd[cmd.index("--num_epochs") + 1] == "280"
    assert cmd[cmd.index("--config_name") + 1] == "finetuning-base"


def test_batched_finetune_submit_template(tmp_path):
    """--submit_template generalizes the reference's LSF bsub path
    (reference batched_finetune.py:123-135): {cmd}/{name}/{log} are
    substituted and the submission is a single shell string."""
    from latentpose_tpu.cli.batched_finetune import main
    ckpt = tmp_path / "exp" / "checkpoints" / "model_00000010.ckpt"
    ckpt.mkdir(parents=True)
    (ckpt / "meta.json").write_text("{}")
    img_dir = tmp_path / "data" / "images-cropped" / "id1" / "vidA" / "identity"
    img_dir.mkdir(parents=True)
    for i in range(14):
        (img_dir / f"{i:05d}.jpg").write_bytes(b"x")

    commands = main([
        "--model", str(ckpt),
        "--data_root", str(tmp_path / "data"),
        "--identities", "id1/vidA/identity",
        "--output_dir", str(tmp_path / "pup"),
        "--submit_template", "bsub -J {name} -o {log} {cmd}",
        "--dry_run",
    ])
    assert len(commands) == 1
    submit = commands[0]
    assert isinstance(submit, str)
    assert submit.startswith("bsub -J ")
    assert "model_00000010.ckpt__id1_vidA_identity" in submit
    assert "finetune.log" in submit
    assert "train.py --config_name finetuning-base" in submit
    assert "--batch_size 8" in submit  # min(14 images, default max 8)


def test_batched_drive_dry_run(tmp_path):
    from latentpose_tpu.cli.batched_drive import main
    avatar = tmp_path / "pup" / "id1_vidA_identity" / "checkpoints" / "c1"
    avatar.mkdir(parents=True)
    commands = main([
        "--puppeteering_dir", str(tmp_path / "pup"),
        "--drivers", "synthetic://1", "synthetic://2",
        "--dry_run",
    ])
    assert len(commands) == 1
    assert "drive.py" in commands[0][1]
    assert "synthetic://1" in commands[0]


def test_block_variants_shapes():
    import jax
    import jax.numpy as jnp
    from latentpose_tpu.nn.blocks import (GatedResBlock, MobileNetBlock,
                                          ResBlockNoSpectralNorm,
                                          channel_shuffle)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))

    shuffled = channel_shuffle(x, 4)
    assert shuffled.shape == x.shape
    np.testing.assert_allclose(float(shuffled.sum()), float(x.sum()),
                               rtol=1e-5)

    m = ResBlockNoSpectralNorm(16, 32, norm_layer="in", downsample=True)
    v = m.init(jax.random.PRNGKey(1), x)
    assert m.apply(v, x).shape == (2, 4, 4, 32)

    g = GatedResBlock(16, 16, upsample=True)
    v = g.init(jax.random.PRNGKey(2), x)
    out, _ = g.apply(v, x, mutable=["spectral"])
    assert out.shape == (2, 16, 16, 16)

    mb = MobileNetBlock(16, 16)
    v = mb.init(jax.random.PRNGKey(3), x)
    assert mb.apply(v, x).shape == x.shape


def test_preprocess_pose_3dmm_stage(tmp_path):
    """Optional 3DMM stage (reference preprocess_dataset.sh:148-165 shells
    out to an external estimator): list file + output dir are passed to the
    configured command; absent command -> explicit error."""
    import sys

    import cv2
    import numpy as np
    import pytest

    from latentpose_tpu.cli.preprocess_dataset import main

    img_dir = tmp_path / "images-cropped" / "idA" / "seq1"
    img_dir.mkdir(parents=True)
    for i in range(2):
        cv2.imwrite(str(img_dir / f"{i:05d}.jpg"),
                    np.full((8, 8, 3), 128, np.uint8))

    with pytest.raises(SystemExit, match="pose_3dmm_command"):
        main(["--data_root", str(tmp_path), "--do_compute_pose_3dmm"])

    marker = tmp_path / "invoked.py"
    marker.write_text(
        "import sys, pathlib\n"
        "lst, out = sys.argv[1], sys.argv[2]\n"
        "n = len(open(lst).read().splitlines())\n"
        "(pathlib.Path(out) / f'saw_{n}.txt').write_text('ok')\n")
    main(["--data_root", str(tmp_path), "--do_compute_pose_3dmm",
          "--pose_3dmm_command", f"{sys.executable} {marker}"])
    assert (tmp_path / "pose-3dmm" / "saw_2.txt").exists()
