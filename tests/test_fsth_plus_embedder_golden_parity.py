"""Golden parity for the remaining trainable families: FSTH_plus generator
(keypoint pose + plain LeakyReLU MLP projector) and the FSTH embedder tower
(concat(stickman, rgb) -> strided blocks -> spatial-sum features)."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
from torch.nn.utils import spectral_norm as torch_sn  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax.numpy as jnp  # noqa: E402

from tests.test_generator_golden_parity import (TorchAdaIN,  # noqa: E402
                                                TorchAdaResBlock)


class TorchFSTHPlusGenerator(tnn.Module):
    """Reference generators/FSTH_plus.py at tiny config: constant -> 1 res +
    3 up AdaIN blocks -> head (rgb+segm); projector = 3 plain Linears with
    LeakyReLU(0.05); pose = keypoints - 0.5."""

    class Constant(tnn.Module):
        def __init__(self):
            super().__init__()
            self.constant = tnn.Parameter(torch.randn(1, 32, 4, 4))

    def __init__(self):
        super().__init__()
        self.constant = self.Constant()
        plan = [(32, 32, False), (32, 32, True), (32, 16, True),
                (16, 8, True)]
        blocks = [TorchAdaResBlock(ci, co, up) for ci, co, up in plan]
        self.decoder_blocks = tnn.Sequential(
            *blocks, TorchAdaIN(8), tnn.ReLU(),
            torch_sn(tnn.Conv2d(8, 4, 3, 1, 1), eps=1e-4), tnn.Tanh())
        self.adains = [m for m in self.modules()
                       if isinstance(m, TorchAdaIN)]
        joint = 16 + 136
        hidden = max(512, joint)
        num_affine = sum(2 * m.num_features for m in self.adains)
        self.affine_params_projector = tnn.Sequential(
            tnn.Linear(joint, hidden), tnn.LeakyReLU(0.05),
            tnn.Linear(hidden, hidden), tnn.LeakyReLU(0.05),
            tnn.Linear(hidden, num_affine))

    def forward(self, embeds, keypoints):
        pose = keypoints - 0.5
        affine = self.affine_params_projector(
            torch.cat([embeds, pose], dim=1))
        for m in self.adains:
            m.bias = affine[:, :m.num_features]
            m.weight = affine[:, m.num_features:2 * m.num_features]
            affine = affine[:, 2 * m.num_features:]
        out = self.decoder_blocks(
            self.constant.constant.expand(embeds.shape[0], -1, -1, -1))
        rgb, segm = out[:, :-1], out[:, -1:]
        return rgb * 0.75 + 0.5, segm * 0.5 + 0.5


def test_fsth_plus_generator_parity():
    from convert_torch_weights import (convert_resblock, dense_kernel,
                                       sn_conv)
    from latentpose_tpu.models.generators import FSTH_plus as gen_mod

    torch.manual_seed(4)
    twin = TorchFSTHPlusGenerator().eval()
    embeds = torch.randn(2, 16)
    keypoints = torch.rand(2, 136)
    with torch.no_grad():
        exp_rgb, exp_segm = twin(embeds, keypoints)
        expected = (exp_rgb * exp_segm).numpy()

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, spectral = {}, {}
    params["constant"] = np.transpose(sd["constant.constant"], (0, 2, 3, 1))
    for i, up in enumerate((False, True, True, True)):
        p, s = convert_resblock(sd, f"decoder_blocks.{i}", normalize=True,
                                upsample=up, downsample=False)
        params[f"block{i}"], spectral[f"block{i}"] = p, s
    p, s = sn_conv(sd, "decoder_blocks.6")
    params["head_conv"], spectral["head_conv"] = p, s
    for i, idx in enumerate((0, 2, 4)):
        params[f"projector_{i}"] = {
            "kernel": dense_kernel(
                sd[f"affine_params_projector.{idx}.weight"]),
            "bias": sd[f"affine_params_projector.{idx}.bias"]}

    m = gen_mod.Generator(num_channels=8, max_num_channels=32,
                          identity_embedding_size=16,
                          pose_embedding_size=136, output_image_size=32,
                          num_residual_blocks=1)
    rgbs, segm = m.apply(
        {"params": params, "spectral": spectral},
        {"embeds": jnp.asarray(embeds.numpy()),
         "dec_keypoints": jnp.asarray(keypoints.numpy()[:, None])},
        update_stats=False)
    np.testing.assert_allclose(
        np.asarray(rgbs), np.transpose(expected, (0, 2, 3, 1)),
        rtol=2e-4, atol=5e-4)


class TorchFSTHEmbedder(tnn.Module):
    """Reference embedders/FSTH.py at tiny config (3 blocks): stem over
    concat(stickman, rgb) (6ch), 1 strided block, 1 widening block,
    relu + spatial sum."""

    def __init__(self):
        super().__init__()
        self.down_block = tnn.Sequential(
            tnn.ZeroPad2d(1),
            torch_sn(tnn.Conv2d(6, 8, 3, 1, 0), eps=1e-4), tnn.ReLU(),
            tnn.ZeroPad2d(1),
            torch_sn(tnn.Conv2d(8, 8, 3, 1, 0), eps=1e-4), tnn.AvgPool2d(2))
        self.skip = tnn.Sequential(
            torch_sn(tnn.Conv2d(6, 8, 1), eps=1e-4), tnn.AvgPool2d(2))

        def down(cin, cout):
            # inplace=True: reference blocks.py:73 — the first ReLU
            # mutates the block input, so the skip path sees relu(x)
            return tnn.Sequential(
                tnn.ReLU(inplace=True), tnn.Sequential(),
                torch_sn(tnn.Conv2d(cin, cout, 3, 1, 1), eps=1e-4),
                tnn.ReLU(inplace=True), tnn.Sequential(),
                torch_sn(tnn.Conv2d(cout, cout, 3, 1, 1), eps=1e-4),
                tnn.AvgPool2d(2))

        class Block(tnn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.block = down(cin, cout)
                self.skip = tnn.Sequential(
                    torch_sn(tnn.Conv2d(cin, cout, 1), eps=1e-4),
                    tnn.AvgPool2d(2))

            def forward(self, x):
                return self.block(x) + self.skip(x)

        self.down_blocks = tnn.Sequential(Block(8, 16), Block(16, 16))

    def forward(self, stickman, rgb):
        x = torch.cat([stickman, rgb], dim=1)
        out = self.down_block(x) + self.skip(x)
        out = self.down_blocks(out)
        out = torch.relu(out)
        return out.view(out.shape[0], 16, -1).sum(2)


def test_fsth_embedder_parity():
    from convert_torch_weights import convert_resblock, sn_conv
    from latentpose_tpu.models.embedders import FSTH as emb_mod

    torch.manual_seed(5)
    twin = TorchFSTHEmbedder().eval()
    rgb = torch.rand(2, 3, 16, 16)
    stick = torch.rand(2, 3, 16, 16)
    with torch.no_grad():
        expected = twin(stick, rgb).numpy()

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    enc_p, enc_s = {}, {}
    for ours, theirs in (("stem_conv0", "down_block.1"),
                         ("stem_conv1", "down_block.4"),
                         ("stem_skip", "skip.0")):
        p, s = sn_conv(sd, theirs)
        enc_p[ours], enc_s[ours] = p, s
    for i in range(2):
        p, s = convert_resblock(sd, f"down_blocks.{i}", normalize=False,
                                upsample=False, downsample=True)
        enc_p[f"block{i + 1}"], enc_s[f"block{i + 1}"] = p, s

    m = emb_mod.Embedder(num_channels=8, max_num_channels=16,
                         embed_channels=16, num_blocks=3)
    params = {"encoder": enc_p}
    spectral = {"encoder": enc_s}
    to_nhwc = lambda t: jnp.asarray(
        np.transpose(t.numpy(), (0, 2, 3, 1))[:, None])
    embeds, elemwise, pose = m.apply(
        {"params": params, "spectral": spectral},
        to_nhwc(rgb), None, to_nhwc(stick))
    assert pose is None
    np.testing.assert_allclose(np.asarray(elemwise[:, 0]), expected,
                               rtol=5e-4, atol=5e-4)
