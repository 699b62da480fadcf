"""Threaded device_prefetch (runners/loop.py): ordering, uint8 wire
quantization, producer-error propagation, and clean early abandonment."""

import time
import types

import numpy as np
import pytest

from latentpose_tpu.runners.loop import device_prefetch


def _pairs(n, fail_at=None):
    for i in range(n):
        if fail_at is not None and i == fail_at:
            raise RuntimeError("boom in producer")
        yield ({"pose_input_rgbs":
                np.full((2, 1, 4, 4, 3), i / 255.0, np.float32)},
               {"label": np.array([i, i], np.int32)})


def test_order_and_uint8_wire():
    args = types.SimpleNamespace(transfer_dtype="uint8")
    out = list(device_prefetch(_pairs(6), args, mesh=None, depth=3))
    assert len(out) == 6
    for i, batch in enumerate(out):
        assert int(batch["label"][0]) == i          # order preserved
        assert batch["pose_input_rgbs"].dtype == np.uint8
        assert int(np.asarray(batch["pose_input_rgbs"]).max()) == i


def test_producer_error_propagates():
    args = types.SimpleNamespace(transfer_dtype="float32")
    it = device_prefetch(_pairs(10, fail_at=2), args, mesh=None, depth=2)
    got = [next(it), next(it)]
    assert len(got) == 2
    with pytest.raises(RuntimeError, match="boom in producer"):
        for _ in it:
            pass


def test_early_abandonment_stops_producer():
    pulled = []

    def slow_pairs():
        for i in range(1000):
            pulled.append(i)
            yield ({"x": np.zeros((1,), np.float32)}, {})

    args = types.SimpleNamespace(transfer_dtype="float32")
    it = device_prefetch(slow_pairs(), args, mesh=None, depth=2)
    next(it)
    it.close()  # consumer walks away; finally-block signals the producer
    time.sleep(0.5)
    n = len(pulled)
    time.sleep(0.3)
    assert len(pulled) == n, "producer kept pulling after abandonment"
    assert n < 50
