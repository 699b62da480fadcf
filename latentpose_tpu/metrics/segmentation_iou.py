"""Segmentation IoU metric plugin (fake_segm vs real_segm at 0.5)."""

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
        fake = data_dict.get("fake_segm")
        real = data_dict.get("real_segm")
        if fake is None or real is None:
            return {}, {}
        if real.ndim > 4:
            real = real[:, 0]
        f = fake > 0.5
        r = real > 0.5
        inter = jnp.logical_and(f, r).sum()
        union = jnp.logical_or(f, r).sum()
        iou = inter / jnp.maximum(union, 1)
        return {"segm_IoU": float(iou)}, {"segm_IoU": 1}
