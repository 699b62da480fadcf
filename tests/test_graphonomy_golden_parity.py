"""Graphonomy port numeric validation (VERDICT r1 item 6): a torch twin of
the exact preprocess/graphonomy.py graph (DeepLabV3+ on aligned Xception +
graph reasoning) is exported through tools/convert_torch_weights.py's
``graphonomy`` converter and must reproduce our flax outputs numerically.

Run at reduced width/depth (the converter is purely structural, so mapping
correctness is width-independent); the real release checkpoint converts with
the same code path (WEIGHTS.md recipe).  Reference counterpart: the
Graphonomy submodule used by ``utils/preprocess_dataset.sh:128-145``.
"""

import os
import sys

import numpy as np
import pytest

import torch
import torch.nn as tnn
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

NUM_CLASSES = 20
CFG = dict(stem_widths=(8, 12), entry_widths=(16, 24, 32),
           middle_blocks=2, exit_widths=(32, 40, 48, 48, 56))
ASPP_FEATURES = 32


class TorchSeparableConv(tnn.Module):
    def __init__(self, c_in, c_out, stride=1, dilation=1):
        super().__init__()
        self.depthwise = tnn.Conv2d(c_in, c_in, 3, stride, padding=dilation,
                                    dilation=dilation, groups=c_in,
                                    bias=False)
        self.bn_dw = tnn.BatchNorm2d(c_in)
        self.pointwise = tnn.Conv2d(c_in, c_out, 1, bias=False)
        self.bn_pw = tnn.BatchNorm2d(c_out)

    def forward(self, x):
        return self.bn_pw(self.pointwise(self.bn_dw(self.depthwise(x))))


class TorchXceptionBlock(tnn.Module):
    def __init__(self, c_in, features, stride=1, dilation=1,
                 skip_type="conv"):
        super().__init__()
        self.skip_type = skip_type
        c = c_in
        for i, f in enumerate(features):
            s = stride if i == len(features) - 1 else 1
            setattr(self, f"sep{i}", TorchSeparableConv(c, f, s, dilation))
            c = f
        if skip_type == "conv":
            self.skip_conv = tnn.Conv2d(c_in, features[-1], 1, stride,
                                        bias=False)
            self.skip_bn = tnn.BatchNorm2d(features[-1])
        self.n = len(features)

    def forward(self, x):
        h = x
        for i in range(self.n):
            h = getattr(self, f"sep{i}")(F.relu(h))
        if self.skip_type == "conv":
            return h + self.skip_bn(self.skip_conv(x))
        if self.skip_type == "sum":
            return h + x
        return h


class TorchXception65(tnn.Module):
    def __init__(self, stem_widths, entry_widths, middle_blocks,
                 exit_widths):
        super().__init__()
        s0, s1 = stem_widths
        self.conv1 = tnn.Conv2d(3, s0, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(s0)
        self.conv2 = tnn.Conv2d(s0, s1, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(s1)
        e1, e2, e3 = entry_widths
        self.block1 = TorchXceptionBlock(s1, (e1, e1, e1), stride=2)
        self.block2 = TorchXceptionBlock(e1, (e2, e2, e2), stride=2)
        self.block3 = TorchXceptionBlock(e2, (e3, e3, e3), stride=2)
        self.middle_blocks = middle_blocks
        for i in range(middle_blocks):
            setattr(self, f"mid{i}",
                    TorchXceptionBlock(e3, (e3, e3, e3), skip_type="sum"))
        x1, x2, x3, x4, x5 = exit_widths
        self.exit1 = TorchXceptionBlock(e3, (x1, x2, x2), stride=1)
        self.exit_sep1 = TorchSeparableConv(x2, x3, dilation=2)
        self.exit_sep2 = TorchSeparableConv(x3, x4, dilation=2)
        self.exit_sep3 = TorchSeparableConv(x4, x5, dilation=2)

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.block1(h)
        low = h
        h = self.block2(h)
        h = self.block3(h)
        for i in range(self.middle_blocks):
            h = getattr(self, f"mid{i}")(h)
        h = self.exit1(h)
        h = F.relu(self.exit_sep1(h))
        h = F.relu(self.exit_sep2(h))
        h = F.relu(self.exit_sep3(h))
        return h, low


class TorchASPP(tnn.Module):
    def __init__(self, c_in, features, rates=(6, 12, 18)):
        super().__init__()
        self.b0 = tnn.Conv2d(c_in, features, 1, bias=False)
        self.bn0 = tnn.BatchNorm2d(features)
        for i, r in enumerate(rates):
            setattr(self, f"b{i + 1}",
                    tnn.Conv2d(c_in, features, 3, padding=r, dilation=r,
                               bias=False))
            setattr(self, f"bn{i + 1}", tnn.BatchNorm2d(features))
        self.b_pool = tnn.Conv2d(c_in, features, 1, bias=False)
        self.bn_pool = tnn.BatchNorm2d(features)
        self.proj = tnn.Conv2d(features * 5, features, 1, bias=False)
        self.bn_proj = tnn.BatchNorm2d(features)
        self.n_rates = len(rates)

    def forward(self, x):
        branches = [F.relu(self.bn0(self.b0(x)))]
        for i in range(self.n_rates):
            branches.append(F.relu(
                getattr(self, f"bn{i + 1}")(getattr(self, f"b{i + 1}")(x))))
        pooled = x.mean(dim=(2, 3), keepdim=True)
        pooled = F.relu(self.bn_pool(self.b_pool(pooled)))
        pooled = pooled.expand(-1, -1, x.shape[2], x.shape[3])
        h = torch.cat(branches + [pooled], dim=1)
        return F.relu(self.bn_proj(self.proj(h)))


class TorchGraphReasoning(tnn.Module):
    def __init__(self, c, num_nodes=NUM_CLASSES, node_features=128):
        super().__init__()
        self.node_proj = tnn.Linear(c, node_features)
        self.adjacency = tnn.Parameter(torch.randn(num_nodes, num_nodes))
        self.gcn1 = tnn.Linear(node_features, node_features)
        self.gcn2 = tnn.Linear(node_features, node_features)
        self.fuse = tnn.Conv2d(c + node_features, c, 1)

    def forward(self, feats, logits):
        b, c, h, w = feats.shape
        assign = torch.softmax(logits, dim=1)           # (B, N, H, W)
        assign_flat = assign.flatten(2).transpose(1, 2)  # (B, P, N)
        feats_flat = feats.flatten(2).transpose(1, 2)    # (B, P, C)
        weights_sum = assign_flat.sum(dim=1, keepdim=True) + 1e-6
        nodes = torch.einsum("bpn,bpc->bnc", assign_flat, feats_flat) \
            / weights_sum.transpose(1, 2)
        nodes = self.node_proj(nodes)
        adj = torch.softmax(self.adjacency, dim=-1)
        nodes = F.relu(self.gcn1(torch.einsum("nm,bmc->bnc", adj, nodes)))
        nodes = F.relu(self.gcn2(torch.einsum("nm,bmc->bnc", adj, nodes)))
        back = torch.einsum("bpn,bnc->bpc", assign_flat, nodes)
        back = back.transpose(1, 2).reshape(b, -1, h, w)
        return F.relu(self.fuse(torch.cat([feats, back], dim=1)))


class TorchGraphonomy(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchXception65(**CFG)
        feats_c = CFG["exit_widths"][-1]
        low_c = CFG["entry_widths"][0]
        self.aspp = TorchASPP(feats_c, ASPP_FEATURES)
        self.low_proj = tnn.Conv2d(low_c, 48, 1, bias=False)
        self.low_bn = tnn.BatchNorm2d(48)
        self.dec1 = tnn.Conv2d(ASPP_FEATURES + 48, 256, 3, padding=1,
                               bias=False)
        self.dec_bn1 = tnn.BatchNorm2d(256)
        self.dec2 = tnn.Conv2d(256, 256, 3, padding=1, bias=False)
        self.dec_bn2 = tnn.BatchNorm2d(256)
        self.classifier = tnn.Conv2d(256, NUM_CLASSES, 1)
        self.graph = TorchGraphReasoning(256)
        self.classifier_refine = tnn.Conv2d(256, NUM_CLASSES, 1)

    def forward(self, images):
        """images: (B, 3, H, W) in [0, 1]."""
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        x = (images - mean) / std
        feats, low = self.backbone(x)
        h = self.aspp(feats)
        h = F.interpolate(h, size=low.shape[2:], mode="bilinear",
                          align_corners=False)
        lowp = F.relu(self.low_bn(self.low_proj(low)))
        h = torch.cat([h, lowp], dim=1)
        h = F.relu(self.dec_bn1(self.dec1(h)))
        h = F.relu(self.dec_bn2(self.dec2(h)))
        logits = self.classifier(h)
        h = self.graph(h, logits)
        logits = logits + self.classifier_refine(h)
        logits = F.interpolate(logits, size=images.shape[2:],
                               mode="bilinear", align_corners=False)
        return torch.softmax(logits, dim=1)


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.uniform(-0.3, 0.3, m.running_mean.shape)
                .astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, m.running_var.shape)
                .astype(np.float32)))


@pytest.mark.slow
def test_graphonomy_conversion_numeric_parity():
    import jax.numpy as jnp

    from convert_torch_weights import convert_graphonomy
    from latentpose_tpu.preprocess.graphonomy import Graphonomy
    from latentpose_tpu.utils.weights import load_flat_npz_variables

    torch.manual_seed(13)
    twin = TorchGraphonomy().eval()
    with torch.no_grad():
        _randomize_bn_stats(twin, np.random.RandomState(5))
        x = torch.rand(1, 3, 64, 64)
        expected = twin(x).numpy()

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = load_flat_npz_variables(convert_graphonomy(sd))

    model = Graphonomy(num_classes=NUM_CLASSES, backbone_cfg=CFG,
                       aspp_features=ASPP_FEATURES)
    probs = model.apply(
        variables, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        train=False)
    np.testing.assert_allclose(
        np.asarray(probs), np.transpose(expected, (0, 2, 3, 1)),
        rtol=2e-3, atol=2e-3)
    # probabilities: rows sum to 1
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-4)
