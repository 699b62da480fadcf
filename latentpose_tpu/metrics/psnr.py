"""PSNR metric plugin.

The reference declares a ``metrics/`` plugin directory (``train.py:31``,
``utils/utils.py:144``) but ships no metrics (default ``--metrics ""``).
Metric plugins follow the criterion contract; ``__call__(data_dict)`` ->
``(values_dict, counts_dict)`` (reference ``holycow.py:203-210``).
"""

from __future__ import annotations

import jax.numpy as jnp


class Wrapper:
    @staticmethod
    def get_args(parser):
        return parser

    @staticmethod
    def get_net(args):
        return Metric()


class Metric:
    def __call__(self, data_dict):
        fake = data_dict["fake_rgbs"]
        real = data_dict["target_rgbs"]
        if real.ndim > 4:
            real = real[:, 0]
        mse = jnp.mean((fake - real) ** 2)
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
        return {"PSNR": float(psnr)}, {"PSNR": 1}
