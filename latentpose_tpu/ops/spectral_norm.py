"""Spectral normalization with explicit power-iteration state.

TPU-native rethink of torch.nn.utils.spectral_norm as used throughout the
reference (eps=1e-4 everywhere; reference ``generators/common/blocks.py``,
``discriminators/no_landmarks.py:88-91``).

Torch semantics we reproduce exactly:
- the weight is viewed as a 2-D matrix W (out_features, -1);
- in training mode each *forward* performs one power iteration
  ``v = normalize(Wᵀu); u = normalize(Wv)`` with no grad, stores (u, v), and
  then divides by ``sigma = uᵀ W v`` (gradients flow into W only);
- in eval mode the stored (u, v) are reused without updating.

Because the reference discriminator runs three forwards per train step
(fake-for-G, fake-for-D, real — ``discriminators/no_landmarks.py:154-161``),
the u/v state advances three times per step there; our train step threads the
mutable "spectral" collection through the same three applications in the same
order.

The power-iteration state lives in a flax variable collection named
``"spectral"`` — a pytree the TrainState carries and the jitted step updates,
exactly once per *application* with ``update_stats=True`` (SURVEY.md §7 "hard
parts": spectral norm under jit).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.ops import initializers as tinit

COLLECTION = "spectral"


def _l2_normalize(x, eps):
    # torch F.normalize: x / max(||x||, eps)
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def _sn_init_u(key, out_features):
    u = jax.random.normal(key, (out_features,))
    return _l2_normalize(u, 1e-12)


class _SNMixin:
    """Shared spectral-norm machinery for SN layers.

    Subclasses call ``self._spectral_normalize(w2d, update_stats)`` where
    ``w2d`` has shape (out_features, fan_in_flat).
    """

    def _spectral_normalize(self, w2d, update_stats: bool):
        out_features, in_flat = w2d.shape
        u_var = self.variable(
            COLLECTION, "u",
            lambda: _sn_init_u(self.make_rng("params")
                               if self.has_rng("params")
                               else jax.random.PRNGKey(0), out_features))
        v_var = self.variable(
            COLLECTION, "v", lambda: jnp.zeros((in_flat,), jnp.float32))

        w_sg = jax.lax.stop_gradient(w2d).astype(jnp.float32)

        if self.is_initializing():
            # Initialize v consistently with u (one torch-style iteration).
            v0 = _l2_normalize(w_sg.T @ u_var.value, self.sn_eps)
            u0 = _l2_normalize(w_sg @ v0, self.sn_eps)
            u_var.value, v_var.value = u0, v0

        u, v = u_var.value, v_var.value
        if update_stats and not self.is_initializing():
            v = _l2_normalize(w_sg.T @ u, self.sn_eps)
            u = _l2_normalize(w_sg @ v, self.sn_eps)
            u_var.value, v_var.value = u, v

        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (w2d.astype(jnp.float32) @ v)
        return (w2d / sigma.astype(w2d.dtype)).astype(w2d.dtype)


class _QuantConvMixin:
    """int8 conv dispatch shared by the plain and fused-upsample branches:
    dynamic per-call scales, or static calibrated scales kept in the
    'quant_calib' collection (per-channel running absmax while the
    collection is mutable — the calibration pass; reduced to a per-tensor
    scale at serve time, ops/quant.py)."""

    def _quant_conv(self, x, kernel, strides, pad, dtype):
        from latentpose_tpu.ops.quant import (act_absmax_per_channel,
                                              conv2d_int8,
                                              conv2d_int8_static)
        # dynamic init must NOT grow a quant_calib collection (the dynamic
        # module's variable tree stays identical to the float module's);
        # the collection appears only for static modules and during the
        # mutable calibration pass
        track = (self.quant_static
                 or (self.is_mutable_collection("quant_calib")
                     and not self.is_initializing()))
        if track:
            calib = self.variable(
                "quant_calib", "act_absmax",
                lambda: jnp.zeros((x.shape[-1],), jnp.float32))
            if self.is_mutable_collection("quant_calib") \
                    and not self.is_initializing():
                calib.value = jnp.maximum(calib.value,
                                          act_absmax_per_channel(x))
        if self.quant_static:
            return conv2d_int8_static(x, kernel, calib.value, strides,
                                      pad, out_dtype=dtype)
        return conv2d_int8(x, kernel, strides, pad, out_dtype=dtype)


class SNConv(nn.Module, _SNMixin, _QuantConvMixin):
    """3x3/1x1 conv with spectral norm (torch Conv2d + spectral_norm parity).

    NHWC inputs; kernel stored HWIO; the 2-D view for power iteration matches
    torch's (O, I*H*W) reshape of its OIHW kernel.
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = 1          # int zero-padding like torch Conv2d(padding=N)
    use_bias: bool = True
    sn_eps: float = 1e-4
    # fused nearest-up-2x + conv (exact sub-pixel decomposition — see
    # ops/image.upsample2x_conv3x3); requires 3x3 kernel, zero pad 1
    upsample_2x: bool = False
    # with upsample_2x: emit the space-to-depth form (B, H, W, 4*features),
    # channels (py, px, c), leaving the interleave to the caller (so a
    # following AdaIN can run in the s2d domain — ops/norms.adain_s2d)
    s2d_output: bool = False
    # int8 MXU path for inference serving (~2x conv throughput on v5e;
    # ops/quant.py) — dynamic activation scale + per-channel weight scales.
    # Approximate; only the drive CLI's --quantize int8 enables it.
    quantize: bool = False
    # with quantize: use STATIC per-input-channel activation scales from
    # the 'quant_calib' collection (populated by a calibration pass that
    # applies the module with mutable=['quant_calib']) instead of the
    # per-call dynamic absmax — no serializing reduce, bf16 epilogues
    # (--quantize int8_static)
    quant_static: bool = False
    # grouped conv (torch Conv2d(groups=g)); the power-iteration 2-D view
    # matches torch's (O, I/g*kh*kw) reshape of its (O, I/g, kh, kw) kernel
    groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_features = x.shape[-1]
        in_per_group = in_features // self.groups
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", tinit.torch_conv_kernel_init,
            (kh, kw, in_per_group, self.features))
        # HWIO -> (O, I, H, W) flattened = torch's view(out, -1) order.
        w2d = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(self.features, -1)
        w2d = self._spectral_normalize(w2d, update_stats)
        kernel_sn = jnp.transpose(
            w2d.reshape(self.features, in_per_group, kh, kw), (2, 3, 1, 0))

        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        dtype = self.dtype or x.dtype
        if self.upsample_2x:
            assert self.kernel_size == (3, 3) and self.padding == 1 \
                and self.strides == (1, 1) and self.groups == 1, \
                "fused upsample_2x needs a 3x3/pad-1/stride-1 dense conv"
            from latentpose_tpu.ops.image import (depth_to_space,
                                                  s2d_up_kernel,
                                                  upsample2x_conv3x3,
                                                  upsample2x_conv3x3_s2d)
            if self.quantize:
                y = self._quant_conv(x.astype(dtype),
                                     s2d_up_kernel(kernel_sn).astype(dtype),
                                     (1, 1), [(1, 1), (1, 1)], dtype)
                if not self.s2d_output:
                    y = depth_to_space(y, self.features)
            elif self.s2d_output:
                y = upsample2x_conv3x3_s2d(x.astype(dtype),
                                           kernel_sn.astype(dtype))
            else:
                y = upsample2x_conv3x3(x.astype(dtype),
                                       kernel_sn.astype(dtype))
        elif self.quantize:
            assert self.groups == 1, "int8 path supports dense convs only"
            y = self._quant_conv(x.astype(dtype), kernel_sn.astype(dtype),
                                 self.strides, pad, dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel_sn.astype(dtype),
                window_strides=self.strides, padding=pad,
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias",
                              tinit.torch_bias_init(kh * kw * in_per_group),
                              (self.features,))
            if self.upsample_2x and self.s2d_output:
                bias = jnp.tile(bias, 4)  # channels are (py, px, c)
            y = y + bias.astype(dtype)
        return y


class SNDense(nn.Module, _SNMixin):
    """Linear layer with spectral norm (torch Linear + spectral_norm parity)."""

    features: int
    use_bias: bool = True
    sn_eps: float = 1e-4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_features = x.shape[-1]
        kernel = self.param("kernel", tinit.torch_conv_kernel_init,
                            (in_features, self.features))
        w2d = self._spectral_normalize(kernel.T, update_stats)  # (out, in)
        dtype = self.dtype or x.dtype
        y = x.astype(dtype) @ w2d.T.astype(dtype)
        if self.use_bias:
            bias = self.param("bias", tinit.torch_bias_init(in_features),
                              (self.features,))
            y = y + bias.astype(dtype)
        return y


class SNEmbed(nn.Module, _SNMixin):
    """Embedding table with spectral norm over the (num, dim) matrix.

    Parity with the reference discriminator's projection embedding
    (``discriminators/no_landmarks.py:86-91``): weights init U(-0.1, 0.1).
    """

    num_embeddings: int
    features: int
    sn_eps: float = 1e-4

    @nn.compact
    def __call__(self, labels, update_stats: bool = False):
        table = self.param("embedding", tinit.uniform_init(-0.1, 0.1),
                           (self.num_embeddings, self.features))
        table_sn = self._spectral_normalize(table, update_stats)
        return jnp.take(table_sn, labels, axis=0)
