"""Shared helpers for criterion plugins."""

from __future__ import annotations


def strip_time(x):
    """Drop the singleton time/frame axis: (B, 1, H, W, C) -> (B, H, W, C).

    Parity with the reference's ``if len(x.shape) > 4: x = x[:, 0]`` guards
    (e.g. ``criterions/perceptual.py:25-29``).
    """
    if x is not None and x.ndim > 4:
        return x[:, 0]
    return x
