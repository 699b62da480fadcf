"""True-LPIPS metric (eval/lpips.py) — parity against a torch twin of the
PerceptualSimilarity v0.1 forward (ScalingLayer -> AlexNet taps -> channel
unit-normalize -> squared diff -> 1x1 lin heads -> spatial mean -> sum),
plus the weight-conversion path and the file-presence gate."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from latentpose_tpu.eval.lpips import (ALEX_CHANNELS, LPIPS_SCALE,
                                       LPIPS_SHIFT, load_lpips_params,
                                       lpips, lpips_fn)

# (out_ch, kernel, stride, pad, maxpool_before) — torchvision alexnet plan
PLAN = ((64, 11, 4, 2, False), (192, 5, 1, 2, True), (384, 3, 1, 1, True),
        (256, 3, 1, 1, False), (256, 3, 1, 1, False))


def random_torch_weights(seed=0):
    """alexnet-features + lin-heads state dicts in the official layouts."""
    rng = np.random.RandomState(seed)
    alex_sd, lin_sd = {}, {}
    conv_indices = (0, 3, 6, 8, 10)
    in_ch = 3
    for i, ((out_ch, k, _s, _p, _pool), idx) in enumerate(
            zip(PLAN, conv_indices)):
        alex_sd[f"features.{idx}.weight"] = torch.from_numpy(
            (rng.randn(out_ch, in_ch, k, k)
             * np.sqrt(2.0 / (k * k * in_ch))).astype(np.float32))
        alex_sd[f"features.{idx}.bias"] = torch.from_numpy(
            rng.randn(out_ch).astype(np.float32) * 0.1)
        lin_sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.randn(1, out_ch, 1, 1)).astype(np.float32) / out_ch)
        in_ch = out_ch
    return alex_sd, lin_sd


def torch_lpips(alex_sd, lin_sd, a, b):
    """Twin of the official forward, NCHW torch."""
    shift = torch.tensor(LPIPS_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(LPIPS_SCALE).view(1, 3, 1, 1)

    def features(x):
        x = x * 2.0 - 1.0
        h = (x - shift) / scale
        taps = []
        conv_indices = (0, 3, 6, 8, 10)
        for (out_ch, k, s, p, pool), idx in zip(PLAN, conv_indices):
            if pool:
                h = F.max_pool2d(h, 3, 2)
            h = F.conv2d(h, alex_sd[f"features.{idx}.weight"],
                         alex_sd[f"features.{idx}.bias"], stride=s,
                         padding=p)
            h = F.relu(h)
            taps.append(h)
        return taps

    with torch.no_grad():
        ta, tb = features(a), features(b)
        total = torch.zeros(a.shape[0])
        for i, (fa, fb) in enumerate(zip(ta, tb)):
            def unit(f):
                return f / (f.pow(2).sum(dim=1, keepdim=True).sqrt()
                            + 1e-10)
            diff2 = (unit(fa) - unit(fb)) ** 2
            w = lin_sd[f"lin{i}.model.1.weight"]
            total = total + F.conv2d(diff2, w).mean(dim=(1, 2, 3))
    return total.numpy()


def converted_npz(tmp_path, seed=0):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import convert_torch_weights as cw

    alex_sd, lin_sd = random_torch_weights(seed)
    flat = cw.convert_lpips({k: v.numpy() for k, v in alex_sd.items()},
                            {k: v.numpy() for k, v in lin_sd.items()})
    cw.save_flat_npz(flat, tmp_path / "lpips_alex.npz")
    return alex_sd, lin_sd


def test_lpips_matches_torch_twin(tmp_path):
    alex_sd, lin_sd = converted_npz(tmp_path)
    params, armed = load_lpips_params(tmp_path)
    assert armed

    rng = np.random.RandomState(1)
    a = rng.rand(3, 64, 64, 3).astype(np.float32)
    b = np.clip(a + rng.randn(3, 64, 64, 3).astype(np.float32) * 0.05,
                0, 1)
    want = torch_lpips(alex_sd, lin_sd,
                       torch.from_numpy(a.transpose(0, 3, 1, 2)),
                       torch.from_numpy(b.transpose(0, 3, 1, 2)))
    got = np.asarray(lpips(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_metric_properties(tmp_path):
    converted_npz(tmp_path, seed=3)
    dist, armed = lpips_fn(tmp_path)
    assert armed
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    assert np.allclose(np.asarray(dist(a, a)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist(a, b)),
                               np.asarray(dist(b, a)), rtol=1e-5)
    assert (np.asarray(dist(a, b)) > 0).all()


def test_lpips_weight_gate(tmp_path):
    with pytest.raises(FileNotFoundError, match="WEIGHTS.md"):
        load_lpips_params(tmp_path / "absent")
    params, armed = load_lpips_params(tmp_path / "absent",
                                      allow_random=True)
    assert not armed
    assert params["conv0"]["kernel"].shape == (11, 11, 3, 64)
    assert tuple(params[f"lin{i}"].shape[0]
                 for i in range(5)) == ALEX_CHANNELS
