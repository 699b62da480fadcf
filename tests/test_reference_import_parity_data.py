"""Data-layer numerics parity against the ACTUAL reference implementation:
the flagship blur-fade crop (``dataloaders/voxceleb2_segmentation_
nolandmarks.py:253-367``) and the stickman rasterizer
(``dataloaders/common/voxceleb.py:260-266``).

The reference module imports imgaug at module scope; imgaug is not installed
here (augmentation itself is quantified against cv2/libjpeg in
tests/test_augmentation_distribution.py), so a stub module satisfies the
import — none of the functions under test touch it.
"""

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference")
if not REFERENCE.exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)
if str(REFERENCE) not in sys.path:
    sys.path.append(str(REFERENCE))

# imgaug stub: only dataloaders.common.augmentation's module-level imports
# touch it, and nothing under test calls into it
if "imgaug" not in sys.modules:
    fake = types.ModuleType("imgaug")
    fake.augmenters = types.ModuleType("imgaug.augmenters")
    sys.modules["imgaug"] = fake
    sys.modules["imgaug.augmenters"] = fake.augmenters

ref_ds = importlib.import_module(
    "dataloaders.voxceleb2_segmentation_nolandmarks")
ref_vox = importlib.import_module("dataloaders.common.voxceleb")

from latentpose_tpu.data.common import crop as our_crop  # noqa: E402
from latentpose_tpu.data.common import voxceleb as our_vox  # noqa: E402


# ---------------------------------------------------------------------------
# bbox integerization
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("t,l,b,r,h,w", [
    (0.1, 0.2, 0.8, 0.9, 100, 120),
    (-0.2, -0.1, 0.7, 0.8, 90, 90),     # out of bounds top/left
    (0.3, 0.4, 1.3, 1.4, 77, 77),       # out of bounds bottom/right
    (0.0, 0.0, 1.0, 1.0, 64, 64),
])
def test_reference_bbox_to_integer_coords_parity(t, l, b, r, h, w):
    exp = ref_ds.bbox_to_integer_coords(t, l, b, r, h, w)
    got = our_crop.bbox_to_integer_coords(t, l, b, r, h, w)
    assert tuple(got) == tuple(exp)


# ---------------------------------------------------------------------------
# blur-fade crop with padding
# ---------------------------------------------------------------------------

def face_like(h, w, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    # add smooth structure so the blur/fade paths matter
    yy, xx = np.mgrid[0:h, 0:w]
    img[..., 0] = (img[..., 0] * 0.3 + 170 * np.exp(
        -((yy - h / 2) ** 2 + (xx - w / 2) ** 2) / (h * w / 8))).astype(
        np.uint8)
    return img


@pytest.mark.parametrize("t,l,b,r", [
    (10, 12, 70, 72),          # fully inside: plain crop
    (-15, -10, 45, 50),        # pads top+left
    (30, 40, 120, 130),        # pads bottom+right
    (-20, -20, 110, 110),      # pads all around
])
def test_reference_crop_with_padding_parity_rgb(t, l, b, r):
    img = face_like(90, 90, seed=t + b + 1000)
    exp = ref_ds.crop_with_padding(img.copy(), t, l, b, r)
    got = our_crop.crop_with_padding(img.copy(), t, l, b, r)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(exp, np.float32),
                               atol=1.0)  # uint8 rounding at the fade mix


@pytest.mark.parametrize("t,l,b,r", [
    (-15, -10, 45, 50),
    (-20, -20, 110, 110),
])
def test_reference_crop_with_padding_parity_segmentation(t, l, b, r):
    rng = np.random.RandomState(7)
    segm = (rng.rand(90, 90) > 0.5).astype(np.uint8) * 255
    exp = ref_ds.crop_with_padding(segm.copy(), t, l, b, r,
                                   segmentation=True)
    got = our_crop.crop_with_padding(segm.copy(), t, l, b, r,
                                     segmentation=True)
    exp = np.asarray(exp, np.float32).reshape(exp.shape[:2] + (-1,))
    got = np.asarray(got, np.float32).reshape(got.shape[:2] + (-1,))
    np.testing.assert_allclose(got, exp, atol=1.0)


# ---------------------------------------------------------------------------
# stickman rasterizer
# ---------------------------------------------------------------------------

def test_reference_stickman_parity():
    rng = np.random.RandomState(3)
    kp = rng.rand(68, 2).astype(np.float32) * 60 + 2

    ref_loader = ref_vox.SampleLoader.__new__(ref_vox.SampleLoader)
    ref_loader.edges_parts, ref_loader.closed_parts, \
        ref_loader.colors_parts = [], [], []
    ref_loader.edges_parts.append(list(range(0, 17)))
    ref_loader.closed_parts.append(False)
    ref_loader.colors_parts.append((255, 255, 255))
    ref_loader.edges_parts.extend([
        list(range(17, 22)), list(range(22, 27)), list(range(27, 31)),
        list(range(31, 36)), list(range(36, 42)), list(range(42, 48)),
        list(range(48, 60))])
    ref_loader.closed_parts.extend([False, False, False, False, True, True,
                                    True])
    ref_loader.colors_parts.extend([
        (255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 0, 255), (255, 0, 255),
        (0, 255, 255), (255, 255, 0)])
    exp = ref_loader.draw_stickman((64, 64), kp)

    ours = our_vox.SampleLoader("/nonexistent", img_dir="x", kp_dir="y")
    got = ours.draw_stickman((64, 64), kp)
    np.testing.assert_array_equal(got, exp)


# ---------------------------------------------------------------------------
# Paper metrics (compute_pose_identity_error.py:254-292)
# ---------------------------------------------------------------------------

def _import_reference_eval():
    # stub the heavy module-level imports the metric functions never touch
    for name in ("face_alignment", "tqdm"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            if name == "tqdm":
                stub.tqdm = lambda x, **k: x
            sys.modules[name] = stub
    # load by explicit path: the repo root ships a same-named CLI shim that
    # would shadow the reference module on sys.path
    spec = importlib.util.spec_from_file_location(
        "ref_compute_pose_identity_error",
        REFERENCE / "compute_pose_identity_error.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_reference_identity_error_parity():
    ref = _import_reference_eval()
    from latentpose_tpu.eval import metrics as ours
    rng = np.random.RandomState(0)
    n = len(ref.IDENTITIES)
    f, d = ref.NUM_VIDEO_FRAMES, ref.FACE_DESCRIPTOR_DIM
    gt = rng.randn(n, d).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True)
    pred = rng.randn(n, n, f, d).astype(np.float32)
    pred /= np.linalg.norm(pred, axis=-1, keepdims=True)
    np.testing.assert_allclose(ours.identity_error(gt, pred),
                               ref.identity_error(gt, pred), rtol=1e-10)


@pytest.mark.parametrize("align", [False, True])
def test_reference_pose_error_parity(align):
    ref = _import_reference_eval()
    from latentpose_tpu.eval import metrics as ours
    rng = np.random.RandomState(1)
    n, f = len(ref.IDENTITIES), ref.NUM_VIDEO_FRAMES
    gt = (rng.rand(n, f, 68, 2) * 200).astype(np.float32)
    pred = (gt * rng.uniform(0.8, 1.2)
            + rng.randn(n, f, 68, 2).astype(np.float32) * 3
            + rng.uniform(-10, 10, (1, 1, 1, 2))).astype(np.float32)
    exp = ref.pose_reconstruction_error(gt, pred.copy(),
                                        apply_optimal_alignment=align)
    got = ours.pose_reconstruction_error(gt, pred.copy(),
                                         apply_optimal_alignment=align)
    # the reference solves a 136x3 lstsq per frame in f64; ours is the
    # closed-form normal-equation optimum — same minimum, float-level agree
    np.testing.assert_allclose(got, exp, rtol=1e-5)


# ---------------------------------------------------------------------------
# Croppers (utils/crop_as_in_dataset.py) — pure geometry functions
# ---------------------------------------------------------------------------

def _import_reference_croppers():
    for name in ("face_alignment", "face_alignment.detection",
                 "face_alignment.detection.sfd"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["face_alignment.detection.sfd"].FaceDetector = object
    sys.modules["face_alignment"].FaceAlignment = object
    sys.modules["face_alignment"].LandmarksType = object
    spec = importlib.util.spec_from_file_location(
        "ref_crop_as_in_dataset", REFERENCE / "utils/crop_as_in_dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_reference_choose_one_detection_parity():
    """LatentPoseCropper.choose_one_detection (:306-332): pick the most
    confident detection, falling back to the largest box."""
    ref = _import_reference_croppers()
    from latentpose_tpu.preprocess import croppers as ours
    rng = np.random.RandomState(5)
    for _ in range(20):
        n = rng.randint(1, 5)
        faces = []
        for _ in range(n):
            l, t = rng.rand(2) * 100
            w, h = rng.rand(2) * 80 + 5
            conf = rng.rand() * 1.2  # some above the .9 threshold, some not
            faces.append([l, t, l + w, t + h, conf])
        exp = ref.LatentPoseFaceCropper.choose_one_detection(faces)
        got = ours.choose_one_detection(faces)
        np.testing.assert_allclose(np.asarray(got, np.float64),
                                   np.asarray(exp, np.float64))


def test_reference_ffhq_crop_from_landmarks_parity():
    """FFHQFaceCropper.crop_from_landmarks (:97-200): the FFHQ quad ->
    rotated crop, on synthetic landmarks over a structured image."""
    ref = _import_reference_croppers()
    from latentpose_tpu.preprocess import croppers as ours
    rng = np.random.RandomState(6)
    img = (rng.rand(160, 170, 3) * 255).astype(np.uint8)
    kp = synthetic_landmarks(rng, 160, 170)
    exp = ref.FFHQFaceCropper.crop_from_landmarks(img.copy(), kp.copy())
    got = ours.FFHQFaceCropper.crop_from_landmarks(img.copy(), kp.copy())
    np.testing.assert_allclose(np.asarray(got[0], np.float32),
                               np.asarray(exp[0], np.float32), atol=1.0)


def synthetic_landmarks(rng, h, w):
    """Plausible 68x3 landmarks (FFHQ cropper reads eyes/mouth rows)."""
    from latentpose_tpu.data.synthetic import synthetic_keypoints
    kp2 = synthetic_keypoints(3, 5, min(h, w)).astype(np.float32)
    kp2 += rng.rand(68, 2).astype(np.float32) * 2
    return np.concatenate([kp2, np.zeros((68, 1), np.float32)], axis=1)
