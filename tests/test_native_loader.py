"""Native C++ loader tests: decode parity vs cv2 and failure handling."""

import numpy as np
import pytest

from latentpose_tpu.data import native_loader


pytestmark = pytest.mark.skipif(not native_loader.is_available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    files = []
    img = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
    p = root / "a.jpg"
    cv2.imwrite(str(p), img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 98])
    files.append((p, img))
    img2 = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    p2 = root / "b.png"
    cv2.imwrite(str(p2), img2[..., ::-1])
    files.append((p2, img2))
    return files


def test_native_decode_matches_cv2(image_files):
    import cv2
    loader = native_loader.NativeBatchLoader(num_threads=2)
    paths = [str(p) for p, _ in image_files]
    out, failed = loader.load(paths, target_size=32)
    assert failed == 0
    assert out.shape == (2, 32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    for i, (p, original) in enumerate(image_files):
        ref = cv2.imread(str(p))[..., ::-1]
        ref = cv2.resize(ref, (32, 32),
                         interpolation=cv2.INTER_LINEAR).astype(np.float32) \
            / 255.0
        # decoders and resamplers differ slightly; demand closeness
        assert np.abs(out[i] - ref).mean() < 0.03


def test_native_crop(image_files):
    import cv2
    loader = native_loader.NativeBatchLoader(num_threads=1)
    p, original = image_files[1]  # 32x32 png
    crops = np.array([[8, 8, 24, 24]], np.int32)  # t, l, b, r
    out, failed = loader.load([str(p)], target_size=16, crops=crops)
    assert failed == 0
    ref = original[8:24, 8:24].astype(np.float32) / 255.0
    assert np.abs(out[0] - ref).mean() < 0.02


def test_native_missing_file_zero_filled():
    loader = native_loader.NativeBatchLoader(num_threads=1)
    out, failed = loader.load(["/nonexistent/x.jpg"], target_size=8)
    assert failed == 1
    assert float(np.abs(out).max()) == 0.0
