"""Full flagship-generator numeric parity: a torch twin assembled exactly
per the reference architecture (vector_pose_unsupervised_segmentation_
noBottleneck.py), randomly initialized, converted through
tools/convert_torch_weights.convert_flagship_generator, must produce
bit-close outputs from our flax generator.  This validates the reference-
checkpoint conversion path end to end."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
from torch.nn.utils import spectral_norm as torch_sn  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# tiny flagship: image 32, channels 8/32 -> 2 res + 3 up blocks
NUM_CH, MAX_CH, IDT, POSE, IMG, NRES = 8, 32, 16, 8, 32, 2


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


class TorchAdaResBlock(tnn.Module):
    def __init__(self, cin, cout, upsample):
        super().__init__()
        layers = [TorchAdaIN(cin), tnn.ReLU()]
        if upsample:
            layers.append(tnn.Upsample(scale_factor=2))
        layers += [
            tnn.Sequential(),  # empty pad placeholder (zero padding mode)
            torch_sn(tnn.Conv2d(cin, cout, 3, 1, 1, bias=False), eps=1e-4),
            TorchAdaIN(cout),
            tnn.ReLU(),
            tnn.Sequential(),
            torch_sn(tnn.Conv2d(cout, cout, 3, 1, 1, bias=False), eps=1e-4),
        ]
        self.block = tnn.Sequential(*layers)
        self.skip = None
        if cin != cout or upsample:
            s = [tnn.Upsample(scale_factor=2)] if upsample else []
            s.append(torch_sn(tnn.Conv2d(cin, cout, 1), eps=1e-4))
            self.skip = tnn.Sequential(*s)

    def forward(self, x):
        return self.block(x) + (self.skip(x) if self.skip else x)


class TorchFlagshipGenerator(tnn.Module):
    """Reference generator structure (noBottleneck.py:40-181), torch twin."""

    class Constant(tnn.Module):
        def __init__(self):
            super().__init__()
            self.constant = tnn.Parameter(torch.randn(1, MAX_CH, 4, 4))

    def __init__(self):
        super().__init__()
        self.constant = self.Constant()
        plan = [(32, 32, False), (32, 32, False), (32, 32, True),
                (32, 16, True), (16, 8, True)]
        blocks = [TorchAdaResBlock(ci, co, up) for ci, co, up in plan]
        self.decoder_blocks = tnn.Sequential(
            *blocks, TorchAdaIN(8), tnn.ReLU(),
            torch_sn(tnn.Conv2d(8, 4, 3, 1, 1), eps=1e-4), tnn.Tanh())
        self.adains = [m for m in self.modules()
                       if isinstance(m, TorchAdaIN)]
        joint = IDT + POSE
        self.affine_params_projector = tnn.Sequential(
            torch_sn(tnn.Linear(joint, 512), eps=1e-4), tnn.ReLU(),
            torch_sn(tnn.Linear(
                512, sum(2 * m.num_features for m in self.adains)),
                eps=1e-4))

    def forward(self, idt, pose):
        affine = self.affine_params_projector(
            torch.cat([idt, pose], dim=1))
        for m in self.adains:
            m.bias = affine[:, :m.num_features]
            m.weight = affine[:, m.num_features:2 * m.num_features]
            affine = affine[:, 2 * m.num_features:]
        out = self.decoder_blocks(
            self.constant.constant.expand(idt.shape[0], -1, -1, -1))
        rgb, segm = out[:, :-1], out[:, -1:]
        rgb = rgb * 0.75 + 0.5
        segm = segm * 0.5 + 0.5
        return rgb * segm, segm


def test_full_generator_conversion_numeric_parity():
    from convert_torch_weights import convert_flagship_generator
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)

    torch.manual_seed(0)
    twin = TorchFlagshipGenerator().eval()
    idt = torch.randn(2, IDT)
    pose = torch.randn(2, POSE)
    with torch.no_grad():
        exp_rgb, exp_segm = twin(idt, pose)

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, spectral, extra = convert_flagship_generator(
        sd, num_blocks=5, num_residual=NRES)
    assert extra == {}

    m = gen_mod.Generator(num_channels=NUM_CH, max_num_channels=MAX_CH,
                          identity_embedding_size=IDT,
                          pose_embedding_size=POSE, output_image_size=IMG,
                          num_residual_blocks=NRES)
    rgbs, segm = m.apply(
        {"params": params, "spectral": spectral},
        {"embeds": jnp.asarray(idt.numpy()),
         "pose_embedding": jnp.asarray(pose.numpy())},
        update_stats=False)

    # one-in-thousands elements sit on the tanh saturation plateau where
    # f32 noise reaches ~3e-4; everything else matches to ~1e-5
    np.testing.assert_allclose(
        np.asarray(rgbs), np.transpose(exp_rgb.numpy(), (0, 2, 3, 1)),
        rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(segm), np.transpose(exp_segm.numpy(), (0, 2, 3, 1)),
        rtol=2e-4, atol=5e-4)
