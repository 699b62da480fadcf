"""MXU-efficient grouped convolution.

ResNeXt-50's 32-group 3x3 convs have 4-16 channels per group; XLA:TPU lowers
``feature_group_count`` convolutions to per-group contractions whose output
dimension (Cg <= 16) starves the 128-lane MXU.  Measured on a v5e chip
(tools/bench_grouped_conv.py, chained-in-jit timing, bf16, B=8):

    stage  shape           native grouped   block-diagonal dense
    1      64^2 x128 Cg=4     0.970 ms          0.123 ms   (7.9x)
    2      32^2 x256 Cg=8     0.573 ms          0.116 ms   (4.9x)
    3      16^2 x512 Cg=16    0.173 ms          0.116 ms   (1.5x)
    4       8^2 x1024 Cg=32   0.090 ms          0.122 ms   (0.74x)

The block-diagonal form runs ONE dense conv whose kernel is the grouped
kernel scattered onto the block diagonal: G x the FLOPs, but those FLOPs are
free — the MXU was padding the tiny per-group matmuls to 128 lanes anyway.
Exact same math (off-diagonal zeros), exact same parameter layout
(3, 3, Cg, C_out grouped-HWIO), so checkpoints and torchvision weight
conversion are unaffected.  Native grouped conv is kept for Cg >= 32 where
it wins.  (Reference counterpart: torch's cuDNN grouped conv inside
``torchvision resnext50_32x4d`` — ``embedders/…_segmentation.py:27``.)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax import lax
import flax.linen as nn

# Measured crossover: block-diagonal wins below 32 channels/group.
# Re-validated END-TO-END at the meta-train scale (64 frames, full 6-loss
# step, v5e): this all-dense-below-32 policy = 125.5 ms/step; flipping
# stages 2-3 to native grouped = 127.8 (native fwd wins isolated — stage3
# 0.109 vs 0.418 ms — but its backward lowering loses more); a custom_vjp
# mixed policy (native fwd + dense bwd) = 132.6 (splitting directions
# breaks XLA's fwd/bwd sharing).  Isolated op benches mislead here; only
# the full-step number decides (tools/bench_step_ablation.py).
BLOCKDIAG_MAX_CHANNELS_PER_GROUP = 16
# coarse-group width for the block-diagonal form (one MXU lane tile);
# set to a huge value to recover the full-dense expansion
COARSE_GROUP_CHANNELS = 128


def expand_blockdiag_kernel(kernel, groups):
    """Grouped-HWIO kernel (kh, kw, Cg, C_out) -> dense (kh, kw, C_in, C_out)
    with the per-group blocks on the diagonal (zeros elsewhere)."""
    kh, kw, cg, c_out = kernel.shape
    co = c_out // groups
    wk = kernel.reshape(kh, kw, cg, groups, co)
    eye = jnp.eye(groups, dtype=kernel.dtype)
    # dense[h, w, g_in, c, g_out, o] = wk[h, w, c, g_out, o] * eye[g_in, g_out]
    dense = wk[:, :, None, :, :, :] * eye[None, None, :, None, :, None]
    return dense.reshape(kh, kw, groups * cg, c_out)


def expand_coarse_blockdiag_kernel(kernel, groups, fine_per_coarse):
    """Coalesce ``fine_per_coarse`` adjacent fine groups into one coarse
    group: (kh, kw, Cg, C_out) grouped kernel -> (kh, kw, f*Cg, C_out)
    kernel for ``feature_group_count = groups // f``, each coarse block a
    block-diagonal of its f fine blocks.

    Padding FLOPs scale with f*Cg instead of C_in — e.g. ResNeXt layer3
    (Cg=16, G=32, C=512) at f=8 pays 8x the grouped FLOPs instead of the
    full-dense 32x, while the MXU still sees f*Cg = 128 lanes.
    """
    kh, kw, cg, c_out = kernel.shape
    f = fine_per_coarse
    gc = groups // f                       # coarse groups
    co = c_out // groups
    # fine group g = g_coarse * f + fo (contiguous in and out)
    wk = kernel.reshape(kh, kw, cg, gc, f, co)
    eye = jnp.eye(f, dtype=kernel.dtype)
    # K[h, w, fi, c, g', fo, o] = wk[h, w, c, g', fo, o] * eye[fi, fo]
    K = wk[:, :, None, :, :, :, :] \
        * eye[None, None, :, None, None, :, None]
    return K.reshape(kh, kw, f * cg, c_out)


class GroupedConv(nn.Module):
    """Drop-in for ``nn.Conv(..., feature_group_count=groups)`` (3x3-style,
    no bias) that picks the faster TPU formulation per channels-per-group.

    Parameter tree is identical to nn.Conv's: ``{kernel: (kh, kw, Cg, C)}``.
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = 1
    groups: int = 32
    use_bias: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cg = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, cg, self.features))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        kernel = kernel.astype(dt)

        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * len(self.kernel_size)
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        if cg <= BLOCKDIAG_MAX_CHANNELS_PER_GROUP and self.groups > 1:
            # coarse-grouped block-diagonal: 128-channel coarse groups keep
            # the MXU lanes full while paying (128/Cg)x padding FLOPs
            # instead of full-dense Gx (see expand_coarse_blockdiag_kernel)
            f = min(self.groups, max(1, COARSE_GROUP_CHANNELS // cg))
            gc = self.groups // f
            if gc > 1 and self.groups % f == 0:
                coarse = expand_coarse_blockdiag_kernel(kernel, self.groups,
                                                        f)
                y = lax.conv_general_dilated(x, coarse, self.strides, pad,
                                             dimension_numbers=dn,
                                             feature_group_count=gc)
            else:
                dense = expand_blockdiag_kernel(kernel, self.groups)
                y = lax.conv_general_dilated(x, dense, self.strides, pad,
                                             dimension_numbers=dn)
        else:
            y = lax.conv_general_dilated(x, kernel, self.strides, pad,
                                         dimension_numbers=dn,
                                         feature_group_count=self.groups)
        if self.use_bias:
            y = y + bias.astype(dt)
        return y
