"""X2Face reproduction through the runner: passthrough embedder + dual-UNet
warp generator + none discriminator + reconstruction losses (the reference's
X2Face config trains without an adversarial term)."""

import types

import numpy as np
import jax
import jax.numpy as jnp

from latentpose_tpu.losses import l1_rgb
from latentpose_tpu.models.discriminators import none as none_dis
from latentpose_tpu.models.embedders import X2Face as x2face_emb
from latentpose_tpu.models.generators import X2Face as x2face_gen
from latentpose_tpu.runners import build, holycow
from latentpose_tpu.data.synthetic import SyntheticDataLoader

IMG = 32


def test_x2face_train_step():
    args = types.SimpleNamespace(
        image_size=IMG, in_channels=3, out_channels=3, num_channels=4,
        max_num_channels=16, embed_channels=16, pose_embedding_size=8,
        num_labels=4, optimizer="Adam", lr_gen=1e-3, lr_dis=1e-3, beta1=0.0,
        finetune=False, iteration=0, set_eval_mode_in_train=False,
        batch_size=2, random_seed=0, l1_weight=30.0,
        use_pixelwise_augs=False, use_affine_scale=False,
        use_affine_shift=False, X2Face_num_identity_images=1)
    models = {
        "embedder": x2face_emb.Wrapper.get_net(args),
        "generator": x2face_gen.Wrapper.get_net(args),
        "discriminator": none_dis.Wrapper.get_net(args),
    }
    criteria = [l1_rgb.Criterion(args.l1_weight)]
    opt_g, opt_d = build.build_optimizers(args,
                                          {"discriminators": none_dis})
    state = build.init_train_state(args, models, opt_g, opt_d,
                                   jax.random.PRNGKey(0))
    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d)

    loader = SyntheticDataLoader(IMG, 2, num_labels=4, num_enc_frames=2)
    data, target = loader.get_batch(0)
    batch = {**data, **target}
    s1, scalars = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(scalars["Loss_l1_rgb"]))
    assert float(scalars["loss_D"]) == 0.0  # none-discriminator

    # reconstruction loss should fall over a few steps (the warp network
    # learns to sample the embedded face)
    s = s1
    first = float(scalars["Loss_l1_rgb"])
    for i in range(6):
        s, scalars = step_fn(s, batch, jax.random.fold_in(
            jax.random.PRNGKey(2), i))
    assert float(scalars["Loss_l1_rgb"]) < first


def test_x2face_generator_warp_is_driver_dependent():
    g = x2face_gen.Generator()
    inputs = {"enc_rgbs": jnp.ones((1, 2, IMG, IMG, 3)) * 0.5,
              "pose_input_rgbs": jnp.zeros((1, 1, IMG, IMG, 3))}
    v = g.init(jax.random.PRNGKey(0), inputs)
    out1, _ = g.apply(v, inputs)
    inputs2 = {**inputs,
               "pose_input_rgbs": jnp.ones((1, 1, IMG, IMG, 3))}
    out2, _ = g.apply(v, inputs2)
    assert float(jnp.abs(out1 - out2).max()) > 1e-6


def test_x2face_finetune_saves_identity_images_and_drives(tmp_path):
    """Reference X2Face fine-tune stores the avatar's identity images into
    the (frozen) model and exits (train.py:222-243); driving then warps
    them.  Exercise that whole flow through the real CLIs."""
    from latentpose_tpu.cli.train import main as train_main
    from latentpose_tpu.cli.drive import main as drive_main

    common = [
        "--embedder", "X2Face", "--generator", "X2Face",
        "--discriminator", "none", "--runner", "holycow",
        "--criterions", "l1_rgb",
        "--dataloader", "synthetic",
        "--image_size", "32", "--embed_channels", "16",
        "--pose_embedding_size", "8",
        "--batch_size", "2", "--num_devices", "1",
        "--log_frequency_images", "9999",
        "--log_frequency_fixed_images", "9999",
        "--experiments_dir", str(tmp_path),
    ]
    train_main(common + ["--num_epochs", "1",
                         "--experiment_name", "x2face_meta"])
    ckpts = sorted((tmp_path / "x2face_meta" / "checkpoints").iterdir())

    state = train_main(common + [
        "--finetune", "--checkpoint_path", str(ckpts[-1]),
        "--X2Face_num_identity_images", "3",
        "--experiment_name", "x2face_ft"])
    assert "finetune_identity_images" in state.params
    assert state.params["finetune_identity_images"].shape[1] == 3

    ft_ckpts = sorted((tmp_path / "x2face_ft" / "checkpoints").iterdir())
    results = drive_main([
        str(ft_ckpts[-1]), "--images_paths", "synthetic://1",
        "--destination", str(tmp_path / "drv"), "--drive_batch_size", "4"])
    assert results and results[0].exists()


def test_drive_from_frames_directory(tmp_path):
    """Driving from a directory of image frames exercises the C++ native
    batch decoder (or its cv2 fallback) inside the drive CLI."""
    import cv2
    from latentpose_tpu.data.synthetic import render_face
    from latentpose_tpu.cli.drive import main as drive_main

    # driver frames on disk
    frames_dir = tmp_path / "driver_frames"
    frames_dir.mkdir()
    for f in range(6):
        img = (render_face(4, f, 32)[0] * 255).astype(np.uint8)
        cv2.imwrite(str(frames_dir / f"{f:03d}.jpg"), img[..., ::-1])

    # reuse a tiny fine-tuned checkpoint built through the CLIs
    from latentpose_tpu.cli.train import main as train_main
    common = [
        "--embedder", "simple_conv",
        "--generator", "vector_pose_unsupervised_segmentation_noBottleneck",
        "--discriminator", "no_landmarks", "--runner", "holycow",
        "--criterions", "adversarial, featmat, dice",
        "--dataloader", "synthetic",
        "--image_size", "32", "--num_channels", "4",
        "--max_num_channels", "16", "--embed_channels", "16",
        "--pose_embedding_size", "8", "--dis_num_blocks", "3",
        "--batch_size", "2", "--num_devices", "1",
        "--log_frequency_images", "9999",
        "--log_frequency_fixed_images", "9999",
        "--experiments_dir", str(tmp_path)]
    train_main(common + ["--num_epochs", "1", "--experiment_name", "meta"])
    meta = sorted((tmp_path / "meta" / "checkpoints").iterdir())[-1]
    train_main(common + ["--finetune", "--checkpoint_path", str(meta),
                         "--num_epochs", "1", "--experiment_name", "ft"])
    ft = sorted((tmp_path / "ft" / "checkpoints").iterdir())[-1]

    results = drive_main([
        str(ft), "--images_paths", str(frames_dir),
        "--destination", str(tmp_path / "drv"), "--drive_batch_size", "4"])
    assert results and results[0].exists()
    cap = cv2.VideoCapture(str(results[0]))
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 6  # one output frame per driver frame
