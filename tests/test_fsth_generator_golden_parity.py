"""FSTH-generator numeric parity: torch twin of the reference encoder-
decoder (generators/FSTH.py) vs our flax FSTH generator with converted
weights — covers the stickman encoder, AdaIN decoder, and the
project-from-identity-alone path that fine-tuning snapshots."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
from torch.nn.utils import spectral_norm as torch_sn  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax.numpy as jnp  # noqa: E402

NUM_CH, MAX_CH, EMB, IMG, NDOWN, NRES = 8, 32, 16, 32, 2, 1


class TorchAdaIN(tnn.Module):
    def __init__(self, features):
        super().__init__()
        self.num_features = features
        self.norm = tnn.InstanceNorm2d(features, eps=1e-4, affine=False)
        self.weight = None
        self.bias = None

    def forward(self, x):
        out = self.norm(x)
        return out * self.weight[:, :, None, None] \
            + self.bias[:, :, None, None]


def sn_conv3(cin, cout, bias):
    return torch_sn(tnn.Conv2d(cin, cout, 3, 1, 1, bias=bias), eps=1e-4)


class TorchInResBlock(tnn.Module):
    """'in'-norm strided block (norm0, relu, conv, norm1, relu, conv, pool)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.InstanceNorm2d(cin, eps=1e-4, affine=True), tnn.ReLU(),
            sn_conv3(cin, cout, False),
            tnn.InstanceNorm2d(cout, eps=1e-4, affine=True), tnn.ReLU(),
            sn_conv3(cout, cout, False), tnn.AvgPool2d(2))
        self.skip = tnn.Sequential(
            torch_sn(tnn.Conv2d(cin, cout, 1), eps=1e-4), tnn.AvgPool2d(2))

    def forward(self, x):
        return self.block(x) + self.skip(x)


class TorchAdaResBlock(tnn.Module):
    def __init__(self, cin, cout, upsample):
        super().__init__()
        # reference zero-padding mode inserts empty Sequential placeholders
        # before each conv (blocks.py:75-89) — keep them so state-dict
        # indices match convert_resblock's layout math
        layers = [TorchAdaIN(cin), tnn.ReLU()]
        if upsample:
            layers.append(tnn.Upsample(scale_factor=2))
        layers += [tnn.Sequential(), sn_conv3(cin, cout, False),
                   TorchAdaIN(cout), tnn.ReLU(),
                   tnn.Sequential(), sn_conv3(cout, cout, False)]
        self.block = tnn.Sequential(*layers)
        self.skip = None
        if cin != cout or upsample:
            s = [tnn.Upsample(scale_factor=2)] if upsample else []
            s.append(torch_sn(tnn.Conv2d(cin, cout, 1), eps=1e-4))
            self.skip = tnn.Sequential(*s)

    def forward(self, x):
        return self.block(x) + (self.skip(x) if self.skip else x)


class TorchFSTHGenerator(tnn.Module):
    """Reference generators/FSTH.py structure at tiny config: stem ->
    1 'in' down block -> 1 ada res + 2 ada up blocks -> head."""

    def __init__(self):
        super().__init__()
        self.down_block = tnn.Sequential(
            sn_conv3(3, NUM_CH, True), tnn.ReLU(),
            sn_conv3(NUM_CH, NUM_CH, True), tnn.AvgPool2d(2))
        self.skip = tnn.Sequential(
            torch_sn(tnn.Conv2d(3, NUM_CH, 1), eps=1e-4), tnn.AvgPool2d(2))
        self.down_blocks = tnn.Sequential(TorchInResBlock(8, 16))
        self.decoder_blocks = tnn.Sequential(
            TorchAdaResBlock(16, 16, False),
            TorchAdaResBlock(16, 16, True),
            TorchAdaResBlock(16, 8, True),
            TorchAdaIN(8), tnn.ReLU(),
            torch_sn(tnn.Conv2d(8, 3, 3, 1, 1), eps=1e-4), tnn.Tanh())
        self.adains = [m for m in self.modules()
                       if isinstance(m, TorchAdaIN)]
        self.project = torch_sn(
            tnn.Linear(EMB, sum(2 * m.num_features for m in self.adains)),
            eps=1e-4)

    def forward(self, embeds, stickman):
        affine = self.project(embeds)
        for m in self.adains:
            m.bias = affine[:, :m.num_features]
            m.weight = affine[:, m.num_features:2 * m.num_features]
            affine = affine[:, 2 * m.num_features:]
        h = self.down_block(stickman) + self.skip(stickman)
        h = self.down_blocks(h)
        return self.decoder_blocks(h)


def convert_in_resblock(sd, prefix, sn_conv):
    params, spectral = {}, {}
    p, s = sn_conv(sd, prefix + ".block.2")
    params["conv0"], spectral["conv0"] = p, s
    p, s = sn_conv(sd, prefix + ".block.5")
    params["conv1"], spectral["conv1"] = p, s
    params["norm0"] = {"weight": sd[prefix + ".block.0.weight"],
                       "bias": sd[prefix + ".block.0.bias"]}
    params["norm1"] = {"weight": sd[prefix + ".block.3.weight"],
                       "bias": sd[prefix + ".block.3.bias"]}
    p, s = sn_conv(sd, prefix + ".skip.0")
    params["skip"], spectral["skip"] = p, s
    return params, spectral


def test_fsth_generator_conversion_numeric_parity():
    from convert_torch_weights import convert_resblock, sn_conv, sn_dense
    from latentpose_tpu.models.generators import FSTH as fsth_gen

    torch.manual_seed(3)
    twin = TorchFSTHGenerator().eval()
    embeds = torch.randn(2, EMB)
    stickman = torch.rand(2, 3, IMG, IMG)
    with torch.no_grad():
        expected = twin(embeds, stickman).numpy()

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, spectral = {}, {}
    for ours, theirs in (("stem_conv0", "down_block.0"),
                         ("stem_conv1", "down_block.2"),
                         ("stem_skip", "skip.0")):
        p, s = sn_conv(sd, theirs)
        params[ours], spectral[ours] = p, s
    p, s = convert_in_resblock(sd, "down_blocks.0", sn_conv)
    params["down0"], spectral["down0"] = p, s
    for i in range(3):
        p, s = convert_resblock(sd, f"decoder_blocks.{i}", normalize=True,
                                upsample=i > 0, downsample=False)
        params[f"dec{i}"], spectral[f"dec{i}"] = p, s
    p, s = sn_conv(sd, "decoder_blocks.5")
    params["head_conv"], spectral["head_conv"] = p, s
    p, s = sn_dense(sd, "project")
    params["project"], spectral["project"] = p, s

    m = fsth_gen.Generator(num_channels=NUM_CH, max_num_channels=MAX_CH,
                           embed_channels=EMB,
                           num_downsample_blocks=NDOWN,
                           num_residual_blocks=NRES)
    rgbs, segm = m.apply(
        {"params": params, "spectral": spectral},
        {"embeds": jnp.asarray(embeds.numpy()),
         "dec_stickmen": jnp.asarray(
             np.transpose(stickman.numpy(), (0, 2, 3, 1))[:, None])},
        update_stats=False)
    assert segm is None
    np.testing.assert_allclose(
        np.asarray(rgbs), np.transpose(expected, (0, 2, 3, 1)),
        rtol=2e-4, atol=5e-4)
