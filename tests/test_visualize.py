"""make_visual grid layout + rasterized caption header (reference
``utils/visualize.py:10-72`` and ``utils/tensorboard_logging.py:33-44``:
the logged image carries a 38-px caption strip on top)."""

import numpy as np

from latentpose_tpu.utils.visualize import (CAPTION_HEIGHT, make_visual,
                                            rasterize_caption_header)


def _data_dict(batch=2, h=32):
    rng = np.random.RandomState(0)
    return {
        "enc_rgbs": rng.rand(batch, 4, h, h, 3).astype(np.float32),
        "pose_input_rgbs": rng.rand(batch, 1, h, h, 3).astype(np.float32),
        "fake_rgbs": rng.rand(batch, h, h, 3).astype(np.float32),
        "real_segm": rng.rand(batch, 1, h, h, 1).astype(np.float32),
        "fake_segm": rng.rand(batch, h, h, 1).astype(np.float32),
    }


def test_make_visual_prepends_caption_header():
    h = 32
    grid, captions = make_visual(_data_dict(batch=2, h=h), n_samples=2)
    # 5 columns: identity | pose src | generated | true segm | pred segm
    assert grid.shape == (CAPTION_HEIGHT + 2 * h, 5 * h, 3)
    assert len(captions) == 2
    assert captions[0].split(" | ") == [
        "identity src", "pose src", "generated", "true segm", "pred segm"]
    header = grid[:CAPTION_HEIGHT]
    # white background with black rasterized text (reference cv2.putText
    # with color (0,0,0) on np.ones strip)
    assert header.max() == 1.0
    assert header.min() < 0.5, "no text was rasterized into the header"
    # the body rows below the header are the untouched sample rows
    assert np.all(grid[CAPTION_HEIGHT:] <= 1.0)


def test_make_visual_cross_driving_columns_share_header():
    h = 16
    d = _data_dict(batch=1, h=h)
    d["pose_input_rgbs_other_person"] = d["pose_input_rgbs"].copy()
    d["fake_rgbs_other_person"] = d["fake_rgbs"].copy()
    grid, captions = make_visual(d, n_samples=1)
    assert "generated_other_person" in captions[0]
    assert grid.shape[0] == CAPTION_HEIGHT + h


def test_rasterize_caption_header_positions():
    strip = rasterize_caption_header(["aa", "bb"], col_width=100,
                                     total_width=200)
    assert strip.shape == (CAPTION_HEIGHT, 200, 3)
    left, right = strip[:, :100], strip[:, 100:]
    assert left.min() < 0.5 and right.min() < 0.5  # one label per column
