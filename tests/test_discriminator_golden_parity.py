"""Full flagship-discriminator numeric parity: torch twin of the reference
architecture (discriminators/no_landmarks.py), converted, must reproduce our
scores and every feature map."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
from torch.nn.utils import spectral_norm as torch_sn  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax.numpy as jnp  # noqa: E402

NUM_CH, MAX_CH, EMB, BLOCKS, IMG, LABELS = 8, 32, 32, 4, 32, 5


class TorchNoNormResBlock(tnn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        # inplace=True matters: like the reference (blocks.py:73), the
        # first ReLU mutates the caller's tensor, so the skip/identity
        # path and any feats alias see relu(x)
        layers = [
            tnn.ReLU(inplace=True), tnn.Sequential(),
            torch_sn(tnn.Conv2d(cin, cout, 3, 1, 1, bias=True), eps=1e-4),
            tnn.ReLU(inplace=True), tnn.Sequential(),
            torch_sn(tnn.Conv2d(cout, cout, 3, 1, 1, bias=True), eps=1e-4),
        ]
        if downsample:
            layers.append(tnn.AvgPool2d(2))
        self.block = tnn.Sequential(*layers)
        self.skip = None
        if cin != cout or downsample:
            s = [torch_sn(tnn.Conv2d(cin, cout, 1), eps=1e-4)]
            if downsample:
                s.append(tnn.AvgPool2d(2))
            self.skip = tnn.Sequential(*s)

    def forward(self, x):
        return self.block(x) + (self.skip(x) if self.skip else x)


class TorchFlagshipDiscriminator(tnn.Module):
    """Reference structure (no_landmarks.py:31-108): image 32, 4 blocks ->
    num_down = min(log2(32)-2, 4) = 3; blocks = 2 down + 1 res (widened)."""

    def __init__(self):
        super().__init__()
        self.down_block = tnn.Sequential(
            torch_sn(tnn.Conv2d(3, NUM_CH, 3, 1, 1), eps=1e-4), tnn.ReLU(),
            torch_sn(tnn.Conv2d(NUM_CH, NUM_CH, 3, 1, 1), eps=1e-4),
            tnn.AvgPool2d(2))
        self.skip = tnn.Sequential(
            torch_sn(tnn.Conv2d(3, NUM_CH, 1), eps=1e-4), tnn.AvgPool2d(2))
        self.blocks = tnn.ModuleList([
            TorchNoNormResBlock(8, 16, True),
            TorchNoNormResBlock(16, EMB, True),
            TorchNoNormResBlock(EMB, EMB, False),
        ])
        self.linear = torch_sn(tnn.Linear(EMB, 1), eps=1e-4)
        embed = tnn.Embedding(LABELS, EMB)
        embed.weight.data.uniform_(-0.1, 0.1)
        self.embed = torch_sn(embed, eps=1e-4)

    def forward(self, x, labels):
        embed = self.embed(labels)
        out = self.down_block(x) + self.skip(x)
        feats = [out]
        for block in self.blocks:
            out = block(out)
            feats.append(out)
        out = torch.relu(out)
        pooled = out.view(out.shape[0], EMB, -1).sum(2)
        score = self.linear(pooled)[:, 0] + (pooled * embed).sum(1)
        return score, feats


def test_full_discriminator_conversion_numeric_parity():
    from convert_torch_weights import convert_flagship_discriminator
    from latentpose_tpu.models.discriminators import no_landmarks as dis_mod

    torch.manual_seed(0)
    twin = TorchFlagshipDiscriminator().eval()
    x = torch.rand(2, 3, IMG, IMG)
    labels = torch.tensor([1, 4])
    with torch.no_grad():
        exp_score, exp_feats = twin(x, labels)

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, spectral = convert_flagship_discriminator(sd, num_blocks=3)

    m = dis_mod.Discriminator(num_channels=NUM_CH, max_num_channels=MAX_CH,
                              embed_channels=EMB, num_blocks=BLOCKS,
                              image_size=IMG, num_labels=LABELS)
    score, feats = m.apply(
        {"params": params, "spectral": spectral},
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        jnp.asarray(labels.numpy()), update_stats=False)

    # NOTE torch spatial sum order: (B, C, H*W).sum(2) == our NHWC
    # (B, H*W, C).sum(1) — same values per channel.
    np.testing.assert_allclose(np.asarray(score), exp_score.numpy(),
                               rtol=5e-4, atol=5e-4)
    assert len(feats) == len(exp_feats)
    for got, exp in zip(feats, exp_feats):
        # the twin's never-burned-in spectral norm inflates activations to
        # ~1e4-1e5 (fresh random (u, v) underestimate sigma), so f32
        # op-order noise alone exceeds a 5e-4 atol; 0.1 is ~1e-6 relative
        # at these magnitudes.  Realistically-conditioned parity is covered
        # by tests/test_reference_import_parity.py, which burns the power
        # iteration in first.
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(exp.numpy(), (0, 2, 3, 1)),
            rtol=5e-4, atol=0.1)
