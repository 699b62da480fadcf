"""Block library — TPU-native equivalent of the reference's
``generators/common/blocks.py``.

Differences by design (not omissions):
- AdaIN (weight, bias) are *call arguments* rather than imperatively assigned
  module state (reference ``blocks.py:6-26``'s assign/delete dance exists only
  to save GPU memory under autograd; XLA needs neither).
- NHWC layout; spectral norm carries its power-iteration state in the
  "spectral" flax collection (see ops/spectral_norm.py).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.ops import norms as norm_ops
from latentpose_tpu.ops.image import (avg_pool_2x, depth_to_space,
                                      upsample_nearest_2x)
from latentpose_tpu.ops.spectral_norm import SNConv

AdaParams = Tuple[jnp.ndarray, jnp.ndarray]  # (weight, bias), each (B, C)


def _reflect_pad_1(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


class InstanceNormAffine(nn.Module):
    """InstanceNorm2d(affine=True, eps=1e-4) parity (weight=1, bias=0 init)."""

    features: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return norm_ops.instance_norm_affine(x, weight, bias, self.eps)


class ResBlock(nn.Module):
    """Pre-activation residual block (reference ``blocks.py:47-111``).

    main: [norm0] -> ReLU -> [up x2] -> SNConv3x3 -> [norm1] -> ReLU
          -> SNConv3x3 -> [down avgpool2]
    skip (if in!=out or up or down): [up x2] -> SNConv1x1(bias) -> [down]

    ``norm_layer``: 'none' | 'in' | 'adain'.  Conv biases are disabled when a
    norm is present (reference: ``bias = not normalize``).
    With 'adain', per-sample (weight, bias) pairs for the two norms come in as
    call arguments.
    """

    in_features: int
    out_features: int
    norm_layer: str = "none"          # 'none' | 'in' | 'adain'
    upsample: bool = False
    downsample: bool = False
    padding: str = "zero"             # 'zero' | 'reflection'
    eps: float = 1e-4
    quantize: bool = False            # int8 inference path (ops/quant.py)
    quant_static: bool = False        # calibrated static activation scales

    @nn.compact
    def __call__(self, x, ada0: Optional[AdaParams] = None,
                 ada1: Optional[AdaParams] = None,
                 update_stats: bool = False):
        normalize = self.norm_layer != "none"
        conv_bias = not normalize
        conv_padding = 1 if self.padding == "zero" else 0

        def maybe_pad(h):
            return _reflect_pad_1(h) if self.padding == "reflection" else h

        h = x
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.in_features, self.eps, name="norm0")(h)
        elif self.norm_layer == "adain":
            assert ada0 is not None, "adain ResBlock needs ada0=(weight, bias)"
            h = norm_ops.adain(h, ada0[0], ada0[1], self.eps)

        h = nn.relu(h)
        # Reference in-place aliasing (blocks.py:73 ``activation(inplace=
        # True)`` as the *first* Sequential layer when norm_layer='none'):
        # the block's input tensor is mutated to relu(x) before
        # ``self.skip(input)`` / ``out + input`` run (blocks.py:105-111), so
        # the shortcut actually sees relu(x).  With a norm the first layer is
        # out-of-place and the shortcut sees x.  Verified against the real
        # reference modules in tests/test_reference_import_parity.py.
        shortcut_in = h if self.norm_layer == "none" else x
        if self.upsample and self.padding == "zero" \
                and self.norm_layer == "adain":
            # fused sub-pixel upsample+conv emitting the space-to-depth
            # form, with AdaIN+ReLU applied in the s2d domain (exact) and a
            # single-consumer interleave afterwards.  Keeping norm1's two
            # passes off the interleaved layout is worth ~8.5 ms of the
            # up256 block's 32 ms @ batch 128 (tools/bench_block_pieces.py).
            assert ada1 is not None, "adain ResBlock needs ada1=(weight, bias)"
            h = SNConv(self.out_features, (3, 3), padding=1,
                       use_bias=conv_bias, upsample_2x=True,
                       s2d_output=True, quantize=self.quantize,
                       quant_static=self.quant_static,
                       name="conv0")(h, update_stats)
            h = norm_ops.adain_s2d(h, ada1[0], ada1[1], self.eps)
            h = nn.relu(h)
            h = depth_to_space(h, self.out_features)
        else:
            if self.upsample and self.padding == "zero":
                # fused sub-pixel upsample+conv: exact, never materializes
                # the nearest-upsampled input tensor
                h = SNConv(self.out_features, (3, 3), padding=1,
                           use_bias=conv_bias, upsample_2x=True,
                           quantize=self.quantize,
                       quant_static=self.quant_static,
                           name="conv0")(h, update_stats)
            else:
                if self.upsample:
                    h = upsample_nearest_2x(h)
                h = SNConv(self.out_features, (3, 3), padding=conv_padding,
                           use_bias=conv_bias, quantize=self.quantize,
                       quant_static=self.quant_static,
                           name="conv0")(maybe_pad(h), update_stats)

            if self.norm_layer == "in":
                h = InstanceNormAffine(self.out_features, self.eps,
                                       name="norm1")(h)
            elif self.norm_layer == "adain":
                assert ada1 is not None, \
                    "adain ResBlock needs ada1=(weight, bias)"
                h = norm_ops.adain(h, ada1[0], ada1[1], self.eps)

            h = nn.relu(h)
        h = SNConv(self.out_features, (3, 3), padding=conv_padding,
                   use_bias=conv_bias, quantize=self.quantize,
                       quant_static=self.quant_static,
                   name="conv1")(maybe_pad(h), update_stats)
        if self.downsample:
            h = avg_pool_2x(h)

        needs_skip = (self.in_features != self.out_features or self.upsample
                      or self.downsample)
        if needs_skip:
            # 1x1 conv commutes with nearest upsampling: convolve at the
            # low resolution, then upsample the (usually narrower) result
            s = SNConv(self.out_features, (1, 1), padding=0, use_bias=True,
                       quantize=self.quantize,
                       quant_static=self.quant_static,
                       name="skip")(shortcut_in, update_stats)
            if self.upsample:
                s = upsample_nearest_2x(s)
            if self.downsample:
                s = avg_pool_2x(s)
            return h + s
        return h + shortcut_in


def channel_shuffle(x, groups: int):
    """ShuffleNet channel shuffle (reference ``blocks.py:113-136``), NHWC."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class ShuffleConv(nn.Module):
    """ShuffleNet-style factorized conv (reference ``blocks.py:142-164``).

    When both channel counts divide ``groups``: SN-grouped 1x1 -> ReLU6 ->
    channel shuffle -> SN-grouped 3x3 (pad 1) -> ReLU6 -> SN-grouped 1x1.
    Otherwise a single plain SN 3x3 (pad 1) conv.  Parity notes: the
    reference ignores its ``kernel_size``/``stride``/``padding``/``bias``
    arguments in the grouped branch (all inner convs keep their default
    bias=True), so this module takes none of them.
    """

    in_features: int
    out_features: int
    groups: int = 4

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        g = self.groups
        if self.in_features % g == 0 and self.out_features % g == 0:
            h = SNConv(self.out_features, (1, 1), padding=0, groups=g,
                       name="conv0")(x, update_stats)
            h = nn.relu6(h)
            h = channel_shuffle(h, g)
            h = SNConv(self.out_features, (3, 3), padding=1, groups=g,
                       name="conv1")(h, update_stats)
            h = nn.relu6(h)
            return SNConv(self.out_features, (1, 1), padding=0, groups=g,
                          name="conv2")(h, update_stats)
        return SNConv(self.out_features, (3, 3), padding=1,
                      name="conv")(x, update_stats)


class ResBlockShuffle(nn.Module):
    """ResBlock with ShuffleConv in place of every conv (reference
    ``blocks.py:167-235``; unused by shipped configs).

    main: [norm0] -> act -> [up x2] -> ShuffleConv -> [norm1] -> act
          -> ShuffleConv -> [down avgpool2]
    skip (if in!=out or up or down): [up x2] -> ShuffleConv1x1-equivalent
    (the reference passes kernel_size=1 but ShuffleConv ignores it) -> [down]
    """

    in_features: int
    out_features: int
    norm_layer: str = "none"          # 'none' | 'in' | 'adain'
    upsample: bool = False
    downsample: bool = False
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, ada0: Optional[AdaParams] = None,
                 ada1: Optional[AdaParams] = None,
                 update_stats: bool = False):
        h = x
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.in_features, self.eps, name="norm0")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada0[0], ada0[1], self.eps)
        h = nn.relu(h)
        # same in-place first-ReLU aliasing as ResBlock: with norm='none'
        # the reference shortcut sees relu(x) (blocks.py:193,229-235)
        shortcut_in = h if self.norm_layer == "none" else x
        if self.upsample:
            h = upsample_nearest_2x(h)
        h = ShuffleConv(self.in_features, self.out_features,
                        name="sc0")(h, update_stats)
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.out_features, self.eps,
                                   name="norm1")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada1[0], ada1[1], self.eps)
        h = nn.relu(h)
        h = ShuffleConv(self.out_features, self.out_features,
                        name="sc1")(h, update_stats)
        if self.downsample:
            h = avg_pool_2x(h)
        if (self.in_features != self.out_features or self.upsample
                or self.downsample):
            s = (upsample_nearest_2x(shortcut_in) if self.upsample
                 else shortcut_in)
            s = ShuffleConv(self.in_features, self.out_features,
                            name="skip")(s, update_stats)
            if self.downsample:
                s = avg_pool_2x(s)
            return h + s
        return h + shortcut_in


class ResBlockV2(nn.Module):
    """Parameterized pre-activation residual block (reference
    ``blocks.py:239-301``; unused by shipped configs).

    Same dataflow as ResBlock with zero padding, but the activation is a
    constructor argument and resize is selected by name.  The reference's
    'bn'/'adabn' norm paths raise NameError there (SyncBatchNorm is never
    imported — dead code per SURVEY §2.4), so only 'none'/'in'/'adain' are
    supported here.
    """

    in_features: int
    out_features: int
    resize_layer: str = "none"        # 'none' | 'nearest' | 'avgpool'
    norm_layer: str = "none"          # 'none' | 'in' | 'adain'
    activation: Any = nn.relu
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, ada0: Optional[AdaParams] = None,
                 ada1: Optional[AdaParams] = None,
                 update_stats: bool = False):
        assert self.norm_layer in ("none", "in", "adain"), \
            "bn/adabn are dead code in the reference (SyncBatchNorm NameError)"
        upsample = self.resize_layer == "nearest"
        downsample = self.resize_layer == "avgpool"
        conv_bias = self.norm_layer == "none"
        h = x
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.in_features, self.eps, name="norm0")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada0[0], ada0[1], self.eps)
        h = self.activation(h)
        if upsample:
            h = upsample_nearest_2x(h)
        h = SNConv(self.out_features, (3, 3), padding=1, use_bias=conv_bias,
                   name="conv0")(h, update_stats)
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.out_features, self.eps,
                                   name="norm1")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada1[0], ada1[1], self.eps)
        h = self.activation(h)
        h = SNConv(self.out_features, (3, 3), padding=1, use_bias=conv_bias,
                   name="conv1")(h, update_stats)
        if downsample:
            h = avg_pool_2x(h)
        if (self.in_features != self.out_features or upsample or downsample):
            s = x
            s = SNConv(self.out_features, (1, 1), padding=0, use_bias=True,
                       name="skip")(s, update_stats)
            if upsample:
                s = upsample_nearest_2x(s)
            if downsample:
                s = avg_pool_2x(s)
            return h + s
        return h + x


class ResBlockV2Shuffle(nn.Module):
    """ResBlockV2 with ShuffleConv convs (reference ``blocks.py:303-368``)."""

    in_features: int
    out_features: int
    resize_layer: str = "none"
    norm_layer: str = "none"
    activation: Any = nn.relu
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, ada0: Optional[AdaParams] = None,
                 ada1: Optional[AdaParams] = None,
                 update_stats: bool = False):
        assert self.norm_layer in ("none", "in", "adain"), \
            "bn/adabn are dead code in the reference (SyncBatchNorm NameError)"
        upsample = self.resize_layer == "nearest"
        downsample = self.resize_layer == "avgpool"
        h = x
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.in_features, self.eps, name="norm0")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada0[0], ada0[1], self.eps)
        h = self.activation(h)
        if upsample:
            h = upsample_nearest_2x(h)
        h = ShuffleConv(self.in_features, self.out_features,
                        name="sc0")(h, update_stats)
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.out_features, self.eps,
                                   name="norm1")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada1[0], ada1[1], self.eps)
        h = self.activation(h)
        h = ShuffleConv(self.out_features, self.out_features,
                        name="sc1")(h, update_stats)
        if downsample:
            h = avg_pool_2x(h)
        if (self.in_features != self.out_features or upsample or downsample):
            s = upsample_nearest_2x(x) if upsample else x
            s = ShuffleConv(self.in_features, self.out_features,
                            name="skip")(s, update_stats)
            if downsample:
                s = avg_pool_2x(s)
            return h + s
        return h + x


class ResBlockNoSpectralNorm(nn.Module):
    """ResBlock variant without spectral norm (reference
    ``blocks.py:455-522``; unused by the flagship)."""

    in_features: int
    out_features: int
    norm_layer: str = "none"
    upsample: bool = False
    downsample: bool = False
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, ada0=None, ada1=None, update_stats: bool = False):
        normalize = self.norm_layer != "none"
        h = x
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.in_features, self.eps,
                                   name="norm0")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada0[0], ada0[1], self.eps)
        h = nn.relu(h)
        # same in-place first-ReLU aliasing as ResBlock (blocks.py:481,516-522)
        shortcut_in = h if self.norm_layer == "none" else x
        if self.upsample:
            h = upsample_nearest_2x(h)
        h = nn.Conv(self.out_features, (3, 3), padding=1,
                    use_bias=not normalize, name="conv0")(h)
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.out_features, self.eps,
                                   name="norm1")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada1[0], ada1[1], self.eps)
        h = nn.relu(h)
        h = nn.Conv(self.out_features, (3, 3), padding=1,
                    use_bias=not normalize, name="conv1")(h)
        if self.downsample:
            h = avg_pool_2x(h)
        if (self.in_features != self.out_features or self.upsample
                or self.downsample):
            s = (upsample_nearest_2x(shortcut_in) if self.upsample
                 else shortcut_in)
            s = nn.Conv(self.out_features, (1, 1), name="skip")(s)
            if self.downsample:
                s = avg_pool_2x(s)
            return h + s
        return h + shortcut_in


class GatedBlock(nn.Module):
    """Gated conv block (reference ``blocks.py:372-390``): two parallel SN
    convs, output = act(conv(x)) * sigmoid(gate(x)).

    The convs are spectrally normalized *independently* (two separate torch
    ``spectral_norm`` wrappers), so this cannot be fused into one 2C conv —
    the shared sigma would normalize both halves jointly."""

    out_features: int
    kernel_size: tuple = (3, 3)
    padding: int = 0
    use_bias: bool = True
    activation: Any = nn.relu

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        h = SNConv(self.out_features, self.kernel_size, padding=self.padding,
                   use_bias=self.use_bias, name="conv")(x, update_stats)
        g = SNConv(self.out_features, self.kernel_size, padding=self.padding,
                   use_bias=self.use_bias, name="gate")(x, update_stats)
        return self.activation(h) * nn.sigmoid(g)


class GatedResBlock(nn.Module):
    """Residual block of two GatedBlocks (reference ``blocks.py:393-452``).

    main: [norm0?] -> [up x2] -> pad(1) -> GatedBlock3x3 -> [norm1?]
          -> pad(1) -> GatedBlock3x3 -> [down avgpool2]
    skip (if in!=out or up or down): [up x2] -> GatedBlock1x1 -> [down]
    No standalone activations: the activation lives inside GatedBlock.
    No in-place aliasing quirk here — the main pipe's first layer
    (norm/up/pad) is out-of-place in the reference."""

    in_features: int
    out_features: int
    norm_layer: str = "none"          # 'none' | 'in' | 'adain'
    upsample: bool = False
    downsample: bool = False
    padding: str = "zero"             # 'zero' | 'reflection'
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, ada0: Optional[AdaParams] = None,
                 ada1: Optional[AdaParams] = None,
                 update_stats: bool = False):
        conv_bias = self.norm_layer == "none"

        def pad1(h):
            if self.padding == "reflection":
                return _reflect_pad_1(h)
            return jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))

        h = x
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.in_features, self.eps, name="norm0")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada0[0], ada0[1], self.eps)
        if self.upsample:
            h = upsample_nearest_2x(h)
        h = GatedBlock(self.out_features, (3, 3), padding=0,
                       use_bias=conv_bias, name="gated0")(pad1(h),
                                                          update_stats)
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.out_features, self.eps,
                                   name="norm1")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada1[0], ada1[1], self.eps)
        h = GatedBlock(self.out_features, (3, 3), padding=0,
                       use_bias=conv_bias, name="gated1")(pad1(h),
                                                          update_stats)
        if self.downsample:
            h = avg_pool_2x(h)
        if (self.in_features != self.out_features or self.upsample
                or self.downsample):
            s = upsample_nearest_2x(x) if self.upsample else x
            s = GatedBlock(self.out_features, (1, 1), padding=0,
                           use_bias=True, name="skip")(s, update_stats)
            if self.downsample:
                s = avg_pool_2x(s)
            return h + s
        return h + x


class MobileNetBlock(nn.Module):
    """Depthwise-separable residual block (reference ``blocks.py:525-586``).

    main: conv1x1(expand) -> [norm0?] -> ReLU6 -> [up x2] -> depthwise3x3
          (stride 2 when downsampling) -> [norm1?] -> ReLU6 -> conv1x1
          -> [norm2?]
    skip (if in!=out or up or down): [up x2] -> conv1x1 -> [down avgpool2]
    Plain convs (the reference's spectral_norm wrappers are commented out).
    With 'adain', norm0/norm1 are plain InstanceNorm2d(affine) and only
    norm2 is adaptive ('adain' matches both the reference's ``'in' in
    norm_layer`` and ``'ada' in norm_layer`` branches)."""

    in_features: int
    out_features: int
    norm_layer: str = "none"          # 'none' | 'in' | 'adain'
    upsample: bool = False
    downsample: bool = False
    expansion: int = 6
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, ada2: Optional[AdaParams] = None,
                 update_stats: bool = False):
        normalize = self.norm_layer != "none"
        hidden = int(self.in_features * self.expansion)
        h = nn.Conv(hidden, (1, 1), name="expand")(x)
        if normalize:
            h = InstanceNormAffine(hidden, self.eps, name="norm0")(h)
        h = nn.relu6(h)
        if self.upsample:
            h = upsample_nearest_2x(h)
        h = nn.Conv(hidden, (3, 3),
                    strides=(2, 2) if self.downsample else (1, 1),
                    padding=1, feature_group_count=hidden,
                    name="depthwise")(h)
        if normalize:
            h = InstanceNormAffine(hidden, self.eps, name="norm1")(h)
        h = nn.relu6(h)
        h = nn.Conv(self.out_features, (1, 1), name="project")(h)
        if self.norm_layer == "in":
            h = InstanceNormAffine(self.out_features, self.eps,
                                   name="norm2")(h)
        elif self.norm_layer == "adain":
            h = norm_ops.adain(h, ada2[0], ada2[1], self.eps)
        if (self.in_features != self.out_features or self.upsample
                or self.downsample):
            s = upsample_nearest_2x(x) if self.upsample else x
            s = nn.Conv(self.out_features, (1, 1), name="skip")(s)
            if self.downsample:
                s = avg_pool_2x(s)
            return h + s
        return h + x


class SelfAttention(nn.Module):
    """SAGAN-style self-attention (reference ``blocks.py:589-609``).

    Plain (non-SN) 1x1 convs and a zero-initialized gamma gate, exactly as
    the reference.  Unused by the flagship config; provided for parity with
    the block library."""

    features: int

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        b, h, w, c = x.shape
        f = nn.Conv(c // 8, (1, 1), name="query")(x)
        g = nn.Conv(c // 8, (1, 1), name="key")(x)
        v = nn.Conv(c, (1, 1), name="value")(x)
        fq = f.reshape(b, h * w, c // 8)
        gq = g.reshape(b, h * w, c // 8)
        vq = v.reshape(b, h * w, c)
        attn = nn.softmax(jnp.einsum("bic,bjc->bij", fq, gq,
                                     preferred_element_type=jnp.float32),
                          axis=-1)
        out = jnp.einsum("bij,bjc->bic", attn.astype(vq.dtype), vq)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out.reshape(b, h, w, c) + x
