"""Silent non-parity must be impossible (VERDICT r1 item 7).

Components that need converted pretrained weights hard-error when the files
are absent unless the degraded mode is explicitly opted into:
- PerceptualLoss (VGG19/VGGFace) -> ``allow_random`` / ``--allow_random_vgg``
- eval backends (ArcFace/FAN)    -> ``allow_proxy`` / ``--allow_proxy_eval``

The reference fails loudly in the same situations (its .pth files are
load-bearing: ``criterions/common/perceptual_loss.py:32-60``,
``compute_pose_identity_error.py:86-95``).
"""

import numpy as np
import pytest

from latentpose_tpu.eval import backends as backends_lib
from latentpose_tpu.losses.common.perceptual_loss import PerceptualLoss
from latentpose_tpu.utils.weights import find_weights_file


def test_perceptual_loss_errors_without_weights(tmp_path):
    with pytest.raises(FileNotFoundError, match="allow_random_vgg"):
        PerceptualLoss(weight=1.0, vgg_weights_dir=str(tmp_path),
                       net="caffe")


def test_perceptual_loss_allow_random_optin(tmp_path):
    crit = PerceptualLoss(weight=1.0, vgg_weights_dir=str(tmp_path),
                          net="caffe", allow_random=True)
    x = np.zeros((1, 32, 32, 3), np.float32)
    y = np.ones((1, 32, 32, 3), np.float32)
    assert float(crit(x, y)) > 0.0


def test_perceptual_loss_loads_from_env_dir(tmp_path, monkeypatch):
    """$LATENTPOSE_WEIGHTS_DIR participates in discovery."""
    import jax

    from latentpose_tpu.losses.common import perceptual_loss as pl
    from latentpose_tpu.nn.vgg import VGG19_CFG, VGGFeatures

    module = VGGFeatures(cfg=VGG19_CFG, num_layers=30)
    variables = module.init(jax.random.PRNGKey(42),
                            np.zeros((1, 32, 32, 3), np.float32))
    flat = {}
    for mod, leaves in variables["params"].items():
        for leaf, val in leaves.items():
            flat[f"{mod}/{leaf}"] = np.asarray(val)
    np.savez(tmp_path / pl.WEIGHT_FILES["caffe"], **flat)

    monkeypatch.setenv("LATENTPOSE_WEIGHTS_DIR", str(tmp_path))
    crit = PerceptualLoss(weight=1.0, vgg_weights_dir=None, net="caffe")
    x = np.zeros((1, 32, 32, 3), np.float32)
    assert float(crit(x, x)) == 0.0


def test_find_weights_file_order(tmp_path, monkeypatch):
    explicit = tmp_path / "explicit"
    envdir = tmp_path / "env"
    for d in (explicit, envdir):
        d.mkdir()
        (d / "f.npz").write_bytes(b"x")
    monkeypatch.setenv("LATENTPOSE_WEIGHTS_DIR", str(envdir))
    assert find_weights_file("f.npz", explicit) == str(explicit / "f.npz")
    assert find_weights_file("f.npz", None) == str(envdir / "f.npz")
    monkeypatch.delenv("LATENTPOSE_WEIGHTS_DIR")
    assert find_weights_file("f.npz", None) is None


def test_eval_backends_error_without_weights(tmp_path):
    with pytest.raises(FileNotFoundError, match="allow_proxy_eval"):
        backends_lib.make_descriptor_backend(str(tmp_path))
    with pytest.raises(FileNotFoundError, match="allow_proxy_eval"):
        backends_lib.make_landmark_backend(str(tmp_path))


def test_eval_backends_proxy_optin(tmp_path):
    d = backends_lib.make_descriptor_backend(str(tmp_path), allow_proxy=True)
    lm = backends_lib.make_landmark_backend(str(tmp_path), allow_proxy=True)
    assert isinstance(d, backends_lib.ProxyDescriptorBackend)
    assert isinstance(lm, backends_lib.ProxyLandmarkBackend)


def test_criterion_wrappers_respect_allow_flag(tmp_path):
    import types

    from latentpose_tpu.losses import idt_embed, perceptual

    args = types.SimpleNamespace(
        perc_weight=1e-2, idt_embed_weight=2e-3,
        vgg_weights_dir=str(tmp_path), compute_dtype="float32",
        allow_random_vgg=False)
    for mod in (perceptual, idt_embed):
        with pytest.raises(FileNotFoundError):
            mod.Wrapper.get_net(args)
    args.allow_random_vgg = True
    for mod in (perceptual, idt_embed):
        mod.Wrapper.get_net(args)
