"""Weight-converter tests: numeric parity of the converted VGG19 perceptual
loss against a torch implementation of the reference's pipeline."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

torch = pytest.importorskip("torch")


VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


def build_torch_vgg19_features():
    """The torchvision VGG19 `features` stack (what the reference builds
    before its maxpool->avgpool swap)."""
    import torch.nn as nn
    layers = []
    in_ch = 3
    for item in VGG19_CFG:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, item, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = item
    return nn.Sequential(*layers)


def torch_reference_perceptual(features, x, y, weight):
    """Reference PerceptualLoss forward (perceptual_loss.py:68-110):
    truncate to 30 layers, maxpool->avgpool, caffe normalize, L1 at ReLUs."""
    import torch.nn as nn
    layers = []
    for m in features:
        if isinstance(m, nn.MaxPool2d):
            layers.append(nn.AvgPool2d(2, 2))
        else:
            layers.append(m)
        if len(layers) >= 30:
            break
    mean = torch.tensor([103.939, 116.779, 123.680]).view(1, 3, 1, 1) / 255.
    std = torch.tensor([1.0, 1.0, 1.0]).view(1, 3, 1, 1) / 255.

    def norm(t):
        return ((t + 1) / 2 - mean) / std

    fx, fy = norm(x), norm(y)
    loss = torch.zeros(())
    for layer in layers:
        fx = layer(fx)
        fy = layer(fy)
        if isinstance(layer, nn.ReLU):
            loss = loss + torch.nn.functional.l1_loss(fx, fy)
    return float(loss) * weight


def test_vgg19_conversion_numeric_parity(tmp_path):
    from convert_torch_weights import (VGG19_CONV_INDICES, convert_vgg,
                                       save_flat_npz)
    torch.manual_seed(0)
    features = build_torch_vgg19_features()
    sd = {f"features.{k}": v for k, v in features.state_dict().items()}
    # sanity: conv indices of the cfg match the converter's table
    conv_keys = sorted(int(k.split(".")[1]) for k in sd
                       if k.endswith(".weight"))
    assert tuple(conv_keys) == VGG19_CONV_INDICES

    save_flat_npz(convert_vgg(sd, VGG19_CONV_INDICES),
                  tmp_path / "vgg19_caffe.npz")

    from latentpose_tpu.losses.common.perceptual_loss import PerceptualLoss
    crit = PerceptualLoss(weight=3e-2, vgg_weights_dir=str(tmp_path),
                          net="caffe")

    rng = np.random.RandomState(0)
    fake = rng.rand(2, 32, 32, 3).astype(np.float32)
    real = rng.rand(2, 32, 32, 3).astype(np.float32)

    ours = float(crit(fake, real))
    with torch.no_grad():
        theirs = torch_reference_perceptual(
            features,
            torch.tensor(fake.transpose(0, 3, 1, 2)),
            torch.tensor(real.transpose(0, 3, 1, 2)), 3e-2)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4)


def test_sn_conv_conversion_numeric_parity():
    """torch spectral_norm conv forward == our SNConv with converted
    (weight_orig, u, v) in eval mode (no PI update)."""
    from convert_torch_weights import sn_conv
    import torch.nn as nn
    from torch.nn.utils import spectral_norm as torch_sn

    torch.manual_seed(1)
    conv = torch_sn(nn.Conv2d(8, 16, 3, padding=1), eps=1e-4)
    conv.eval()
    x = torch.randn(2, 8, 10, 10)
    with torch.no_grad():
        conv(x)  # one forward so u is meaningful... (eval: no update)
        expected = conv(x).numpy()

    sd = {f"conv.{k}": v.detach().numpy()
          for k, v in conv.state_dict().items()}
    params, spectral = sn_conv(sd, "conv")

    import jax.numpy as jnp
    from latentpose_tpu.ops.spectral_norm import SNConv
    m = SNConv(16, (3, 3), padding=1, use_bias=True)
    variables = {"params": params, "spectral": spectral}
    got = m.apply(variables, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_sn_embed_conversion_numeric_parity():
    """torch spectral_norm(Embedding) == our SNEmbed with converted state
    (the discriminator's projection matrix W)."""
    from convert_torch_weights import sn_embed
    import torch.nn as nn
    from torch.nn.utils import spectral_norm as torch_sn

    torch.manual_seed(3)
    embed = nn.Embedding(6, 16)
    embed.weight.data.uniform_(-0.1, 0.1)
    embed = torch_sn(embed, eps=1e-4).eval()
    labels = torch.tensor([0, 3, 5])
    with torch.no_grad():
        expected = embed(labels).numpy()

    sd = {f"embed.{k}": v.detach().numpy()
          for k, v in embed.state_dict().items()}
    params, spectral = sn_embed(sd, "embed")

    import jax.numpy as jnp
    from latentpose_tpu.ops.spectral_norm import SNEmbed
    m = SNEmbed(6, 16)
    got = m.apply({"params": params, "spectral": spectral},
                  jnp.asarray(labels.numpy()), False)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4,
                               atol=2e-5)
