"""X2Face / FAbNet release-weight conversion path (VERDICT r1 item 10):
torch twins of the frozen dependency nets (the X2Face embedding/driving
UNets, the FAb-Net encoder) are exported through
``convert_torch_weights.convert_x2face`` / ``convert_fabnet`` and must
reproduce our flax modules numerically; ``runners/build.overlay_pretrained``
injects the converted trees into a fresh TrainState.

Reference counterparts: ``embedders/X2Face_pretrained_embResNeXt.py:30-52``,
``FAbNet_pretrained_embResNeXt.py:30-53``, ``generators/X2Face.py``."""

import os
import sys

import numpy as np
import pytest

import torch
import torch.nn as tnn
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


WIDTHS = (8, 16, 32, 32)


class TorchUNet(tnn.Module):
    """Twin of nn/unet.py UNet (dotted names mirror the flax tree)."""

    def __init__(self, out_features, widths=WIDTHS, in_ch=3):
        super().__init__()
        self.widths = widths
        c = in_ch
        for i, w in enumerate(widths):
            setattr(self, f"down{i}", tnn.Conv2d(c, w, 4, 2, 1))
            c = w
        for i, w in enumerate(reversed(widths[:-1])):
            setattr(self, f"up{i}", tnn.Conv2d(c, w, 3, 1, 1))
            c = w + widths[len(widths) - 2 - i]
        self.head = tnn.Conv2d(c, out_features, 3, 1, 1)

    def forward(self, x, return_bottleneck=False):
        skips = []
        h = x
        for i in range(len(self.widths)):
            h = F.leaky_relu(getattr(self, f"down{i}")(h), 0.2)
            skips.append(h)
        bottleneck = h
        for i in range(len(self.widths) - 1):
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = F.relu(getattr(self, f"up{i}")(h))
            h = torch.cat([h, skips[len(self.widths) - 2 - i]], dim=1)
        h = F.interpolate(h, scale_factor=2, mode="nearest")
        out = self.head(h)
        if return_bottleneck:
            return out, bottleneck
        return out


class TorchX2Face(tnn.Module):
    def __init__(self):
        super().__init__()
        self.embedding_net = TorchUNet(3)
        self.driving_net = TorchUNet(2)


def test_x2face_unet_conversion_numeric_parity(tmp_path):
    import jax.numpy as jnp

    from convert_torch_weights import convert_x2face
    from latentpose_tpu.nn.unet import UNet
    from latentpose_tpu.utils.weights import load_flat_npz_variables

    torch.manual_seed(21)
    twin = TorchX2Face().eval()
    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        exp_emb = twin.embedding_net(x).numpy()
        exp_out, exp_bn = twin.driving_net(x, return_bottleneck=True)

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = load_flat_npz_variables(convert_x2face(sd))
    x_nhwc = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))

    emb_net = UNet(out_features=3, widths=WIDTHS)
    got = emb_net.apply({"params": variables["params"]["embedding_net"]},
                        x_nhwc)
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(exp_emb, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)

    drv_net = UNet(out_features=2, widths=WIDTHS)
    got_out, got_bn = drv_net.apply(
        {"params": variables["params"]["driving_net"]}, x_nhwc,
        return_bottleneck=True)
    np.testing.assert_allclose(np.asarray(got_out),
                               np.transpose(exp_out.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_bn),
                               np.transpose(exp_bn.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)


class TorchFAbNet(tnn.Module):
    """Twin of FAbNetEncoder (conv0..5 + bn0..5 + fc, tanh head)."""

    WIDTHS = (64, 128, 256, 512, 512, 512)

    def __init__(self, out_size=16):
        super().__init__()
        c = 3
        for i, w in enumerate(self.WIDTHS):
            setattr(self, f"conv{i}", tnn.Conv2d(c, w, 4, 2, 1))
            setattr(self, f"bn{i}", tnn.BatchNorm2d(w))
            c = w
        self.fc = tnn.Linear(c, out_size)

    def forward(self, x):
        h = x
        for i in range(len(self.WIDTHS)):
            h = getattr(self, f"bn{i}")(getattr(self, f"conv{i}")(h))
            h = F.leaky_relu(h, 0.2)
        h = h.mean(dim=(2, 3))
        return torch.tanh(self.fc(h))


def test_fabnet_conversion_numeric_parity():
    import jax.numpy as jnp

    from convert_torch_weights import convert_fabnet
    from latentpose_tpu.models.embedders.FAbNet_pretrained_embResNeXt import \
        FAbNetEncoder
    from latentpose_tpu.utils.weights import load_flat_npz_variables

    torch.manual_seed(8)
    twin = TorchFAbNet(out_size=16).eval()
    rng = np.random.RandomState(4)
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.uniform(-0.2, 0.2, m.running_mean.shape)
                    .astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.6, 1.4, m.running_var.shape)
                    .astype(np.float32)))
        x = torch.rand(2, 3, 64, 64)
        expected = twin(x).numpy()

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = load_flat_npz_variables(convert_fabnet(sd))

    got = FAbNetEncoder(out_size=16).apply(
        variables, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        train=False)
    np.testing.assert_allclose(np.asarray(got), expected,
                               rtol=1e-4, atol=1e-4)


def test_overlay_pretrained_injects_and_validates(tmp_path, monkeypatch):
    from latentpose_tpu.runners.build import overlay_pretrained

    np.savez(tmp_path / "fake.npz",
             **{"params/sub/kernel": np.full((2, 2), 7.0, np.float32)})
    monkeypatch.setenv("LATENTPOSE_WEIGHTS_DIR", str(tmp_path))

    class FakeModel:
        PRETRAINED = (("inner", "fake.npz", ""),)

    params = {"embedder": {"inner": {"sub": {"kernel":
                                             np.zeros((2, 2), np.float32)}},
                           "other": {"kernel": np.ones((3,), np.float32)}}}
    stats = {"embedder": {}}
    overlay_pretrained({"embedder": FakeModel()}, params, stats)
    np.testing.assert_array_equal(
        np.asarray(params["embedder"]["inner"]["sub"]["kernel"]),
        np.full((2, 2), 7.0))
    np.testing.assert_array_equal(params["embedder"]["other"]["kernel"],
                                  np.ones((3,)))

    # shape mismatch is a conversion bug -> loud error
    np.savez(tmp_path / "fake.npz",
             **{"params/sub/kernel": np.zeros((5, 5), np.float32)})
    with pytest.raises(ValueError, match="shape"):
        overlay_pretrained({"embedder": FakeModel()}, params, stats)


def test_pretrained_declarations():
    from latentpose_tpu.models.embedders import (
        FAbNet_pretrained_embResNeXt as fab,
        X2Face_pretrained_embResNeXt as x2e)
    from latentpose_tpu.models.generators import X2Face as x2g

    assert x2g.Generator.PRETRAINED == (("", "x2face.npz", ""),)
    assert fab.Embedder.PRETRAINED == (("pose_encoder", "fabnet.npz", ""),)
    assert x2e.Embedder.PRETRAINED == \
        (("pose_unet", "x2face.npz", "driving_net"),)
