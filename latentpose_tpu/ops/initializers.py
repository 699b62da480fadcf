"""Weight initializers matching PyTorch layer defaults.

The reference relies on torch's default inits (kaiming_uniform with a=sqrt(5)
for Conv2d/Linear, i.e. U(-1/sqrt(fan_in), +1/sqrt(fan_in)); same bound for
biases; N(0,1) for Embedding).  Matching them keeps our training dynamics
comparable to the reference's (same scale of activations at step 0).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _fan_in_conv(shape):
    # flax conv kernels are HWIO: fan_in = H * W * I
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return receptive * shape[-2]


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-b, b), b = 1/sqrt(fan_in) — torch Conv2d/Linear default.

    For dense kernels pass shape (in, out); for conv, HWIO.
    """
    bound = 1.0 / np.sqrt(_fan_in_conv(shape))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound,
                                  maxval=bound)

    return init


def uniform_init(low: float, high: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=low, maxval=high)

    return init


def normal_unit_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)
