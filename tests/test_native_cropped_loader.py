"""Native (C++) dataset-parity loader: decode + blur-faded padded crop +
resize must match the python path (data/common/crop.py + cv2 resize) within
quantization tolerance, including out-of-bounds bboxes and the VoxCeleb2.1
border strip."""

import numpy as np
import pytest

from latentpose_tpu.data import native_loader
from latentpose_tpu.data.common import crop as crop_lib

pytestmark = pytest.mark.skipif(not native_loader.is_available(),
                                reason="native loader unavailable")


def _write_png(path, rng, h=96, w=96):
    import cv2
    from scipy.ndimage import uniform_filter
    img = uniform_filter(rng.rand(h, w, 3), size=(7, 7, 1))
    img = (img * 255).astype(np.uint8)
    cv2.imwrite(str(path), img[..., ::-1])
    return img


def _python_path(img, bbox, has_bbox, out_size):
    import cv2
    l, t, r, b = bbox
    ti, li, bi, ri = crop_lib.bbox_to_integer_coords(t, l, b, r,
                                                     *img.shape[:2])
    if has_bbox:
        img = img[1:-1, 1:-1]
        ti, li, bi, ri = ti - 1, li - 1, bi - 1, ri - 1
    cropped = crop_lib.crop_with_padding(img, ti, li, bi, ri)
    interp = cv2.INTER_CUBIC if out_size > bi - ti else cv2.INTER_AREA
    resized = cv2.resize(cropped, (out_size, out_size), interpolation=interp)
    return resized.astype(np.float32) / 255.0


@pytest.mark.parametrize("case", [
    # (raw bbox l, t, r, b in [0,1] BEFORE square+1.8 scale, has_bbox)
    ((0.30, 0.30, 0.70, 0.72), True),    # pads on all sides after x1.8
    ((0.05, 0.05, 0.45, 0.50), True),    # heavy top/left padding
    ((0.55, 0.50, 0.95, 0.95), True),    # heavy bottom/right padding
    ((0.35, 0.40, 0.60, 0.60), False),   # no strip
    ((0.0, 0.0, 1.0, 1.0), False),       # identity-ish (pre-cropped)
])
@pytest.mark.parametrize("out_size", [64, 160])
def test_native_cropped_matches_python(tmp_path, case, out_size):
    raw_bbox, has_bbox = case
    rng = np.random.RandomState(hash((raw_bbox, out_size)) % 2 ** 31)
    img = _write_png(tmp_path / "f.png", rng)

    if raw_bbox == (0.0, 0.0, 1.0, 1.0):
        bbox = raw_bbox
    else:
        bbox = crop_lib.square_and_scale_bbox(*raw_bbox)

    expected = _python_path(img, bbox, has_bbox, out_size)

    loader = native_loader.NativeBatchLoader(num_threads=2)
    got, failed = loader.load_cropped(
        [tmp_path / "f.png"], np.asarray([bbox], np.float64),
        np.asarray([has_bbox], np.uint8), out_size)
    assert failed == 0
    diff = np.abs(got[0] - expected)
    assert diff.max() <= 3.5 / 255.0, diff.max()
    assert diff.mean() <= 0.5 / 255.0, diff.mean()


def test_native_cropped_batch_and_failures(tmp_path):
    rng = np.random.RandomState(0)
    _write_png(tmp_path / "a.png", rng)
    loader = native_loader.NativeBatchLoader(num_threads=2)
    bboxes = np.asarray([[0.1, 0.1, 0.9, 0.9],
                         [0.1, 0.1, 0.9, 0.9]], np.float64)
    got, failed = loader.load_cropped(
        [tmp_path / "a.png", tmp_path / "missing.png"], bboxes,
        np.asarray([1, 1], np.uint8), 32)
    assert failed == 1
    assert got.shape == (2, 32, 32, 3)
    assert np.abs(got[1]).max() == 0.0  # failed slot zeroed
    assert got[0].max() > 0.1


def test_native_cropped_u8_matches_quantized_f32(tmp_path):
    """lpr_load_cropped_batch_u8 (uint8 wire format): bit-equal to the
    f32 path quantized with the wire formula floor(v*255+0.5)
    (runners/loop.quantize_batch_u8) — the quantization just moves onto
    the loader threads."""
    rng = np.random.RandomState(7)
    _write_png(tmp_path / "a.png", rng)
    bbox = crop_lib.square_and_scale_bbox(0.2, 0.15, 0.8, 0.85)
    bboxes = np.asarray([bbox], np.float64)
    flags = np.asarray([1], np.uint8)

    loader = native_loader.NativeBatchLoader(num_threads=2)
    f32, fail_f = loader.load_cropped([tmp_path / "a.png"], bboxes, flags,
                                      64)
    u8, fail_u = loader.load_cropped_u8([tmp_path / "a.png"], bboxes,
                                        flags, 64)
    assert fail_f == 0 and fail_u == 0
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8, (f32 * 255.0 + 0.5).astype(np.uint8))

    # failed slots are zeroed like the f32 path
    u8m, fail_m = loader.load_cropped_u8(
        [tmp_path / "missing.png"], bboxes, flags, 32)
    assert fail_m == 1 and u8m.max() == 0
