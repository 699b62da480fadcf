"""FAN golden parity: a torch twin with face-alignment's exact module
naming (conv1/bn1, convN ConvBlocks, m0/top_m_0/conv_last0/bn_end0/l0/bl0/
al0, hourglass b1..b3 levels) -> tools/convert_torch_weights.convert_fan ->
our eval/fan.py must reproduce the heatmaps."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax.numpy as jnp  # noqa: E402


class TorchConvBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, cout // 2, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout // 2)
        self.conv2 = tnn.Conv2d(cout // 2, cout // 4, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout // 4)
        self.conv3 = tnn.Conv2d(cout // 4, cout // 4, 3, 1, 1, bias=False)
        if cin != cout:
            self.downsample = tnn.Sequential(
                tnn.BatchNorm2d(cin), tnn.ReLU(),
                tnn.Conv2d(cin, cout, 1, bias=False))
        else:
            self.downsample = None

    def forward(self, x):
        b1 = self.conv1(F.relu(self.bn1(x)))
        b2 = self.conv2(F.relu(self.bn2(b1)))
        b3 = self.conv3(F.relu(self.bn3(b2)))
        out = torch.cat([b1, b2, b3], 1)
        if self.downsample is not None:
            return out + self.downsample(x)
        return out + x


class TorchHourGlass(tnn.Module):
    def __init__(self, depth, features):
        super().__init__()
        self.depth = depth
        for level in range(1, depth + 1):
            self.add_module(f"b1_{level}", TorchConvBlock(features,
                                                          features))
            self.add_module(f"b2_{level}", TorchConvBlock(features,
                                                          features))
            if level == 1:
                self.add_module(f"b2_plus_{level}",
                                TorchConvBlock(features, features))
            self.add_module(f"b3_{level}", TorchConvBlock(features,
                                                          features))

    def _forward(self, level, inp):
        up1 = getattr(self, f"b1_{level}")(inp)
        low = F.avg_pool2d(inp, 2)
        low1 = getattr(self, f"b2_{level}")(low)
        if level > 1:
            low2 = self._forward(level - 1, low1)
        else:
            low2 = getattr(self, f"b2_plus_{level}")(low1)
        low3 = getattr(self, f"b3_{level}")(low2)
        up2 = F.interpolate(low3, scale_factor=2, mode="nearest")
        return up1 + up2

    def forward(self, x):
        return self._forward(self.depth, x)


class TorchFAN(tnn.Module):
    def __init__(self, num_modules=1):
        super().__init__()
        self.num_modules = num_modules
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = TorchConvBlock(64, 128)
        self.conv3 = TorchConvBlock(128, 128)
        self.conv4 = TorchConvBlock(128, 256)
        for m in range(num_modules):
            self.add_module(f"m{m}", TorchHourGlass(4, 256))
            self.add_module(f"top_m_{m}", TorchConvBlock(256, 256))
            self.add_module(f"conv_last{m}", tnn.Conv2d(256, 256, 1))
            self.add_module(f"bn_end{m}", tnn.BatchNorm2d(256))
            self.add_module(f"l{m}", tnn.Conv2d(256, 68, 1))
            if m < num_modules - 1:
                self.add_module(f"bl{m}", tnn.Conv2d(256, 256, 1))
                self.add_module(f"al{m}", tnn.Conv2d(68, 256, 1))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.avg_pool2d(self.conv2(x), 2)
        x = self.conv3(x)
        previous = self.conv4(x)
        outputs = []
        for m in range(self.num_modules):
            hg = getattr(self, f"m{m}")(previous)
            ll = getattr(self, f"top_m_{m}")(hg)
            ll = F.relu(getattr(self, f"bn_end{m}")(
                getattr(self, f"conv_last{m}")(ll)))
            heatmaps = getattr(self, f"l{m}")(ll)
            outputs.append(heatmaps)
            if m < self.num_modules - 1:
                previous = previous + getattr(self, f"bl{m}")(ll) \
                    + getattr(self, f"al{m}")(heatmaps)
        return outputs


def test_fan_conversion_numeric_parity():
    from convert_torch_weights import convert_fan
    from latentpose_tpu.eval.fan import FAN

    torch.manual_seed(6)
    twin = TorchFAN(num_modules=1).eval()
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        expected = twin(x)[-1].numpy()

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    flat = convert_fan(sd)
    from latentpose_tpu.utils.weights import load_flat_npz_variables
    variables = load_flat_npz_variables(flat)

    m = FAN(num_modules=1)
    outputs = m.apply(
        variables,
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))), train=False)
    np.testing.assert_allclose(
        np.asarray(outputs[-1]), np.transpose(expected, (0, 2, 3, 1)),
        rtol=5e-4, atol=5e-4)
