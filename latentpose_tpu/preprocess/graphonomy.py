"""Graphonomy universal human parser — JAX/flax architecture port.

The reference computes head+body masks with the Graphonomy submodule
(``preprocess_dataset.sh:128-145``, ``.gitmodules:9-11``), i.e. "Graphonomy:
Universal Human Parsing via Graph Transfer Learning" (Gong et al. 2019):
DeepLabV3+ (Xception-65 backbone, ASPP, decoder) with graph reasoning —
per-class node features extracted by projection against the segmentation
logits, propagated through a small GCN over the label graph, and
re-projected into the feature map.

Inference contract (what the reference pipeline consumes): RGB in, per-pixel
class probabilities out; the person mask is 1 − P(background), averaged over
TTA scales 0.75/1.0/1.5/2.0 (preprocess/segmentation.segment_with_tta).

Weights require conversion from the Graphonomy release checkpoint
(universal CIHP/PASCAL/ATR model); until then preprocess/segmentation.py
falls back to GrabCut with a loud warning.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

CIHP_NUM_CLASSES = 20  # class 0 = background


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class SeparableConv(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        in_features = x.shape[-1]
        h = nn.Conv(in_features, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dilation, kernel_dilation=self.dilation,
                    feature_group_count=in_features, use_bias=False,
                    name="depthwise")(x)
        h = _bn(train, "bn_dw")(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False,
                    name="pointwise")(h)
        h = _bn(train, "bn_pw")(h)
        return h


class XceptionBlock(nn.Module):
    features: Sequence[int]
    stride: int = 1
    dilation: int = 1
    skip_type: str = "conv"   # 'conv' | 'sum' | 'none'
    grow_first: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        h = x
        for i, f in enumerate(self.features):
            h = nn.relu(h)
            s = self.stride if i == len(self.features) - 1 else 1
            h = SeparableConv(f, stride=s, dilation=self.dilation,
                              name=f"sep{i}")(h, train)
        if self.skip_type == "conv":
            skip = nn.Conv(self.features[-1], (1, 1),
                           strides=(self.stride, self.stride),
                           use_bias=False, name="skip_conv")(x)
            skip = _bn(train, "skip_bn")(skip)
            return h + skip
        if self.skip_type == "sum":
            return h + x
        return h


class Xception65(nn.Module):
    """Modified aligned Xception backbone (output stride 16).

    Widths/depth are parametrizable so the golden-parity torch twin can run
    at test scale; defaults are the real Xception-65."""

    stem_widths: Sequence[int] = (32, 64)
    entry_widths: Sequence[int] = (128, 256, 728)
    middle_blocks: int = 16
    exit_widths: Sequence[int] = (728, 1024, 1536, 1536, 2048)

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.Conv(self.stem_widths[0], (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, name="conv1")(x)
        h = _bn(train, "bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.stem_widths[1], (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = _bn(train, "bn2")(h)
        h = nn.relu(h)

        e1, e2, e3 = self.entry_widths
        h = XceptionBlock((e1, e1, e1), stride=2, name="block1")(h, train)
        low_level = h  # stride 4 features for the decoder
        h = XceptionBlock((e2, e2, e2), stride=2, name="block2")(h, train)
        h = XceptionBlock((e3, e3, e3), stride=2, name="block3")(h, train)
        for i in range(self.middle_blocks):  # middle flow
            h = XceptionBlock((e3, e3, e3), skip_type="sum",
                              name=f"mid{i}")(h, train)
        x1, x2, x3, x4, x5 = self.exit_widths
        h = XceptionBlock((x1, x2, x2), stride=1, dilation=1,
                          name="exit1")(h, train)
        h = nn.relu(SeparableConv(x3, dilation=2,
                                  name="exit_sep1")(h, train))
        h = nn.relu(SeparableConv(x4, dilation=2,
                                  name="exit_sep2")(h, train))
        h = nn.relu(SeparableConv(x5, dilation=2,
                                  name="exit_sep3")(h, train))
        return h, low_level


class ASPP(nn.Module):
    features: int = 256
    rates: Sequence[int] = (6, 12, 18)

    @nn.compact
    def __call__(self, x, train=False):
        branches = [nn.relu(_bn(train, "bn0")(
            nn.Conv(self.features, (1, 1), use_bias=False, name="b0")(x)))]
        for i, rate in enumerate(self.rates):
            b = nn.Conv(self.features, (3, 3), padding=rate,
                        kernel_dilation=rate, use_bias=False,
                        name=f"b{i + 1}")(x)
            branches.append(nn.relu(_bn(train, f"bn{i + 1}")(b)))
        pooled = x.mean(axis=(1, 2), keepdims=True)
        pooled = nn.relu(_bn(train, "bn_pool")(
            nn.Conv(self.features, (1, 1), use_bias=False,
                    name="b_pool")(pooled)))
        pooled = jnp.broadcast_to(
            pooled, x.shape[:3] + (self.features,))
        h = jnp.concatenate(branches + [pooled], axis=-1)
        h = nn.Conv(self.features, (1, 1), use_bias=False, name="proj")(h)
        return nn.relu(_bn(train, "bn_proj")(h))


class GraphReasoning(nn.Module):
    """Graphonomy's graph reasoning: project features onto class nodes via
    the current logits, propagate with a GCN over the (learned) label
    adjacency, re-project and fuse."""

    num_nodes: int = CIHP_NUM_CLASSES
    node_features: int = 128

    @nn.compact
    def __call__(self, feats, logits):
        b, h, w, c = feats.shape
        assign = jax.nn.softmax(logits, axis=-1)          # (B, H, W, N)
        assign_flat = assign.reshape(b, h * w, self.num_nodes)
        feats_flat = feats.reshape(b, h * w, c)

        # node features: soft-assignment-weighted average pooling
        weights_sum = assign_flat.sum(axis=1, keepdims=True) + 1e-6
        nodes = jnp.einsum("bpn,bpc->bnc", assign_flat, feats_flat) \
            / jnp.swapaxes(weights_sum, 1, 2)
        nodes = nn.Dense(self.node_features, name="node_proj")(nodes)

        adjacency = self.param(
            "adjacency", nn.initializers.orthogonal(),
            (self.num_nodes, self.num_nodes))
        adj = jax.nn.softmax(adjacency, axis=-1)
        nodes = nn.relu(nn.Dense(self.node_features, name="gcn1")(
            jnp.einsum("nm,bmc->bnc", adj, nodes)))
        nodes = nn.relu(nn.Dense(self.node_features, name="gcn2")(
            jnp.einsum("nm,bmc->bnc", adj, nodes)))

        # re-project node features into the map and fuse
        back = jnp.einsum("bpn,bnc->bpc", assign_flat, nodes)
        back = back.reshape(b, h, w, self.node_features)
        fused = jnp.concatenate([feats, back], axis=-1)
        return nn.relu(nn.Conv(c, (1, 1), name="fuse")(fused))


class Graphonomy(nn.Module):
    """DeepLabV3+ + graph reasoning; returns (B, H, W, num_classes) probs."""

    num_classes: int = CIHP_NUM_CLASSES
    backbone_cfg: dict = None
    aspp_features: int = 256

    @nn.compact
    def __call__(self, images, train=False):
        """images: (B, H, W, 3) float32 in [0, 1]."""
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        x = (images - mean) / std

        feats, low_level = Xception65(
            name="backbone", **(self.backbone_cfg or {}))(x, train)
        h = ASPP(self.aspp_features, name="aspp")(feats, train)

        # decoder: upsample to the low-level stride, concat, refine
        h = jax.image.resize(h, low_level.shape[:3] + (h.shape[-1],),
                             "bilinear")
        low = nn.relu(_bn(train, "low_bn")(
            nn.Conv(48, (1, 1), use_bias=False, name="low_proj")(low_level)))
        h = jnp.concatenate([h, low], axis=-1)
        h = nn.relu(_bn(train, "dec_bn1")(
            nn.Conv(256, (3, 3), padding=1, use_bias=False, name="dec1")(h)))
        h = nn.relu(_bn(train, "dec_bn2")(
            nn.Conv(256, (3, 3), padding=1, use_bias=False, name="dec2")(h)))

        logits = nn.Conv(self.num_classes, (1, 1), name="classifier")(h)
        h = GraphReasoning(self.num_classes, name="graph")(h, logits)
        logits = logits + nn.Conv(self.num_classes, (1, 1),
                                  name="classifier_refine")(h)

        logits = jax.image.resize(
            logits, images.shape[:3] + (self.num_classes,), "bilinear")
        return jax.nn.softmax(logits, axis=-1)


def person_mask(probs):
    """(B, H, W, num_classes) -> (B, H, W) person probability
    (1 - background); channel 0 is background in CIHP."""
    return 1.0 - probs[..., 0]
