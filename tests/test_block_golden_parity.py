"""Golden block parity: our ResBlock / instance-norm / AdaIN vs torch twins
built exactly per the reference structure (generators/common/blocks.py),
with weights converted layer-by-layer through tools/convert_torch_weights."""

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


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_instance_norm_parity():
    from latentpose_tpu.ops.norms import instance_norm
    x = np.random.RandomState(0).randn(2, 4, 6, 5).astype(np.float32) * 3
    ref = tnn.InstanceNorm2d(4, eps=1e-4, affine=False)(torch.tensor(x))
    got = instance_norm(jnp.asarray(to_nhwc(x)), eps=1e-4)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref.numpy()),
                               rtol=1e-4, atol=1e-5)


def test_adain_parity():
    """AdaptiveNorm2d parity (reference blocks.py:6-26): IN then per-sample
    (weight, bias)."""
    from latentpose_tpu.ops.norms import adain
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 6, 5).astype(np.float32)
    w = rng.randn(2, 4).astype(np.float32)
    b = rng.randn(2, 4).astype(np.float32)
    base = tnn.InstanceNorm2d(4, eps=1e-4, affine=False)(torch.tensor(x))
    ref = base * torch.tensor(w)[:, :, None, None] \
        + torch.tensor(b)[:, :, None, None]
    got = adain(jnp.asarray(to_nhwc(x)), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref.numpy()),
                               rtol=1e-4, atol=1e-5)


class TorchRefResBlock(tnn.Module):
    """The reference ResBlock (blocks.py:47-111), 'in' norm, zero padding."""

    def __init__(self, cin, cout, upsample):
        super().__init__()
        layers = [
            tnn.InstanceNorm2d(cin, eps=1e-4, affine=True),
            tnn.ReLU(),
        ]
        if upsample:
            layers.append(tnn.Upsample(scale_factor=2))
        layers += [
            torch_sn(tnn.Conv2d(cin, cout, 3, 1, 1, bias=False), eps=1e-4),
            tnn.InstanceNorm2d(cout, eps=1e-4, affine=True),
            tnn.ReLU(),
            torch_sn(tnn.Conv2d(cout, cout, 3, 1, 1, bias=False), eps=1e-4),
        ]
        self.block = tnn.Sequential(*layers)
        self.skip = None
        if cin != cout or upsample:
            s = [tnn.Upsample(scale_factor=2)] if upsample else []
            s.append(torch_sn(tnn.Conv2d(cin, cout, 1), eps=1e-4))
            self.skip = tnn.Sequential(*s)

    def forward(self, x):
        out = self.block(x)
        return out + (self.skip(x) if self.skip is not None else x)


@pytest.mark.parametrize("cin,cout,upsample", [(8, 8, False), (8, 16, True)])
def test_resblock_in_norm_parity(cin, cout, upsample):
    from convert_torch_weights import sn_conv
    from latentpose_tpu.nn.blocks import ResBlock

    torch.manual_seed(0)
    ref = TorchRefResBlock(cin, cout, upsample).eval()
    x = torch.randn(2, cin, 8, 8)
    with torch.no_grad():
        expected = ref(x).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    up = 1 if upsample else 0
    conv0 = f"block.{2 + up}"
    conv1 = f"block.{5 + up}"
    params, spectral = {}, {}
    p, s = sn_conv(sd, conv0)
    params["conv0"], spectral["conv0"] = p, s
    p, s = sn_conv(sd, conv1)
    params["conv1"], spectral["conv1"] = p, s
    params["norm0"] = {"weight": sd["block.0.weight"],
                       "bias": sd["block.0.bias"]}
    params["norm1"] = {"weight": sd[f"block.{3 + up}.weight"],
                       "bias": sd[f"block.{3 + up}.bias"]}
    if ref.skip is not None:
        p, s = sn_conv(sd, f"skip.{1 if upsample else 0}")
        params["skip"], spectral["skip"] = p, s

    m = ResBlock(cin, cout, norm_layer="in", upsample=upsample)
    got = m.apply({"params": params, "spectral": spectral},
                  jnp.asarray(to_nhwc(x.numpy())), update_stats=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(expected),
                               rtol=2e-4, atol=2e-4)


class TorchRefResBlockReflect(tnn.Module):
    """Reference ResBlock with reflection padding (blocks.py: padding(1) +
    conv(pad=0))."""

    def __init__(self, cin, cout):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.InstanceNorm2d(cin, eps=1e-4, affine=True), tnn.ReLU(),
            tnn.ReflectionPad2d(1),
            torch_sn(tnn.Conv2d(cin, cout, 3, 1, 0, bias=False), eps=1e-4),
            tnn.InstanceNorm2d(cout, eps=1e-4, affine=True), tnn.ReLU(),
            tnn.ReflectionPad2d(1),
            torch_sn(tnn.Conv2d(cout, cout, 3, 1, 0, bias=False), eps=1e-4),
        )
        self.skip = torch_sn(tnn.Conv2d(cin, cout, 1), eps=1e-4) \
            if cin != cout else None

    def forward(self, x):
        return self.block(x) + (self.skip(x) if self.skip else x)


def test_resblock_reflection_padding_parity():
    from convert_torch_weights import sn_conv
    from latentpose_tpu.nn.blocks import ResBlock

    torch.manual_seed(2)
    ref = TorchRefResBlockReflect(8, 16).eval()
    x = torch.randn(2, 8, 8, 8)
    with torch.no_grad():
        expected = ref(x).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, spectral = {}, {}
    p, s = sn_conv(sd, "block.3")
    params["conv0"], spectral["conv0"] = p, s
    p, s = sn_conv(sd, "block.7")
    params["conv1"], spectral["conv1"] = p, s
    params["norm0"] = {"weight": sd["block.0.weight"],
                       "bias": sd["block.0.bias"]}
    params["norm1"] = {"weight": sd["block.4.weight"],
                       "bias": sd["block.4.bias"]}
    p, s = sn_conv(sd, "skip")
    params["skip"], spectral["skip"] = p, s

    m = ResBlock(8, 16, norm_layer="in", padding="reflection")
    got = m.apply({"params": params, "spectral": spectral},
                  jnp.asarray(to_nhwc(x.numpy())), update_stats=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(expected),
                               rtol=2e-4, atol=2e-4)


def test_grouped_conv_conversion_parity():
    """ResNeXt's grouped 3x3 conv: torch (O, I/g, kh, kw) -> flax HWIO with
    feature_group_count — the subtlest kernel-layout conversion in the
    embedder converter."""
    import flax.linen as fnn
    from convert_torch_weights import conv_kernel

    torch.manual_seed(7)
    conv = tnn.Conv2d(64, 64, 3, padding=1, groups=32, bias=False).eval()
    x = torch.randn(2, 64, 8, 8)
    with torch.no_grad():
        expected = conv(x).numpy()

    kernel = conv_kernel(conv.weight.detach().numpy())
    m = fnn.Conv(64, (3, 3), padding=1, feature_group_count=32,
                 use_bias=False)
    got = m.apply({"params": {"kernel": jnp.asarray(kernel)}},
                  jnp.asarray(to_nhwc(x.numpy())))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(expected),
                               rtol=2e-4, atol=2e-4)


def test_depthwise_conv_conversion_parity():
    """MobileNetV2's depthwise conv (groups == channels)."""
    import flax.linen as fnn
    from convert_torch_weights import conv_kernel

    torch.manual_seed(8)
    conv = tnn.Conv2d(32, 32, 3, padding=1, groups=32, bias=False).eval()
    x = torch.randn(2, 32, 8, 8)
    with torch.no_grad():
        expected = conv(x).numpy()

    kernel = conv_kernel(conv.weight.detach().numpy())
    m = fnn.Conv(32, (3, 3), padding=1, feature_group_count=32,
                 use_bias=False)
    got = m.apply({"params": {"kernel": jnp.asarray(kernel)}},
                  jnp.asarray(to_nhwc(x.numpy())))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(expected),
                               rtol=2e-4, atol=2e-4)
