"""uint8 wire format emitted directly by the synthetic data source
(`wire_dtype='uint8'`): values must equal quantize_batch_u8 of the f32
path exactly, and the aux consumers (visuals, host dequant) must handle
uint8 batches."""

import numpy as np

from latentpose_tpu.data.synthetic import (SyntheticDataLoader,
                                           SyntheticDataset)
from latentpose_tpu.runners.loop import (dequantize_batch_host,
                                         quantize_batch_u8)

IMG_KEYS = ("enc_rgbs", "pose_input_rgbs", "target_rgbs", "real_segm")


def test_dataset_u8_matches_quantized_f32():
    kw = dict(num_labels=4, num_enc_frames=2, frames_per_video=4)
    ds_f32 = SyntheticDataset(32, **kw)
    ds_u8 = SyntheticDataset(32, wire_dtype="uint8", **kw)
    # deterministic frame sampling so both datasets pick the same frames
    ds_f32.loader.deterministic = True
    ds_u8.loader.deterministic = True
    for i in range(4):
        data_f, target_f = ds_f32[i]
        data_u, target_u = ds_u8[i]
        want = quantize_batch_u8({**data_f, **target_f})
        got = {**data_u, **target_u}
        for key in IMG_KEYS:
            assert got[key].dtype == np.uint8, key
            np.testing.assert_array_equal(got[key], want[key], err_msg=key)


def test_loader_u8_matches_quantized_f32():
    kw = dict(batch_size=3, num_labels=4, num_enc_frames=2,
              frames_per_video=4, seed=7)
    lo_f32 = SyntheticDataLoader(16, **kw)
    lo_u8 = SyntheticDataLoader(16, wire_dtype="uint8", **kw)
    data_f, target_f = lo_f32.get_batch(0)
    data_u, target_u = lo_u8.get_batch(0)
    want = quantize_batch_u8({**data_f, **target_f})
    got = {**data_u, **target_u}
    for key in IMG_KEYS:
        assert got[key].dtype == np.uint8, key
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)
    np.testing.assert_array_equal(got["label"], want["label"])


def test_stickmen_u8_wire():
    lo = SyntheticDataLoader(16, batch_size=2, num_labels=2,
                             num_enc_frames=2, frames_per_video=4,
                             stickmen=True, wire_dtype="uint8")
    data, _ = lo.get_batch(0)
    assert data["enc_stickmen"].dtype == np.uint8
    assert data["dec_stickmen"].dtype == np.uint8
    assert data["dec_keypoints"].dtype == np.float32  # not an image


def test_dequantize_batch_host_roundtrip():
    lo = SyntheticDataLoader(16, batch_size=2, num_labels=2,
                             num_enc_frames=2, frames_per_video=4,
                             wire_dtype="uint8")
    data, target = lo.get_batch(0)
    deq = dequantize_batch_host({**data, **target})
    for key in IMG_KEYS:
        assert deq[key].dtype == np.float32
        assert 0.0 <= float(deq[key].min()) and float(deq[key].max()) <= 1.0
    assert deq["label"].dtype == np.int32  # untouched


def test_make_visual_accepts_u8():
    from latentpose_tpu.utils.visualize import CAPTION_HEIGHT, make_visual
    lo = SyntheticDataLoader(16, batch_size=2, num_labels=2,
                             num_enc_frames=2, frames_per_video=4,
                             wire_dtype="uint8")
    data, target = lo.get_batch(0)
    d = {**data, **target,
         "fake_rgbs": np.random.rand(2, 16, 16, 3).astype(np.float32)}
    grid, _ = make_visual(d, n_samples=1)
    assert grid.shape[0] == CAPTION_HEIGHT + 16
    assert float(grid.max()) <= 1.0  # u8 columns rescaled, not saturated
