"""Preprocessing toolchain tests (hermetic: explicit bboxes/landmarks)."""

import numpy as np
import pytest

from latentpose_tpu.preprocess.croppers import (FFHQFaceCropper,
                                                LatentPoseFaceCropper,
                                                choose_one_detection,
                                                ffhq_quad_from_landmarks)


def test_choose_one_detection_largest():
    faces = [[0, 0, 10, 10, 0.9], [0, 0, 100, 100, 0.5]]
    assert choose_one_detection(faces)[:4] == [0, 0, 100, 100]
    assert choose_one_detection([])[:4] == [0, 0, 200, 200]


def test_latentpose_cropper_with_explicit_bbox():
    rng = np.random.RandomState(0)
    image = (rng.rand(300, 300, 3) * 255).astype(np.uint8)
    cropper = LatentPoseFaceCropper(output_size=(64, 64))
    cropped, lm = cropper.crop_image(image, bbox=[100, 100, 200, 200],
                                     compute_landmarks=False)
    assert cropped.shape == (64, 64, 3)
    assert cropped.dtype == np.uint8
    assert lm is None


def test_latentpose_cropper_needs_detector_without_bbox():
    cropper = LatentPoseFaceCropper(output_size=(64, 64))
    with pytest.raises(RuntimeError, match="face-detector"):
        cropper.crop_image(np.zeros((64, 64, 3), np.uint8), bbox=None,
                           compute_landmarks=False)


def _synthetic_landmarks():
    from latentpose_tpu.eval.backends import procedural_mean_face
    lm = procedural_mean_face(256)
    return np.concatenate([lm, np.zeros((68, 1), np.float32)], axis=1)


def test_ffhq_quad_geometry():
    quad, qsize = ffhq_quad_from_landmarks(_synthetic_landmarks())
    assert quad.shape == (4, 2)
    assert qsize > 50
    # quad is a (rotated) square: all sides equal
    sides = [np.linalg.norm(quad[i] - quad[(i + 1) % 4]) for i in range(4)]
    np.testing.assert_allclose(sides, sides[0], rtol=1e-5)


def test_ffhq_crop_from_landmarks():
    rng = np.random.RandomState(0)
    image = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
    out, lm = FFHQFaceCropper.crop_from_landmarks(image,
                                                  _synthetic_landmarks())
    assert out.dtype == np.uint8
    assert out.ndim == 3 and out.shape[2] == 3
    assert lm.shape == (68, 3)


def test_s3fd_architecture_shapes():
    import jax
    import jax.numpy as jnp
    from latentpose_tpu.preprocess.s3fd import S3FD
    model = S3FD()
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outputs = model.apply(variables, x)
    assert len(outputs) == 6
    # head 0 at stride 4: 32x32; all heads 2-class after maxout
    assert outputs[0][0].shape == (1, 32, 32, 2)
    assert outputs[0][1].shape == (1, 32, 32, 4)
    assert outputs[-1][0].shape[1] == 128 // 128


def test_grabcut_segmentation_and_tta():
    from latentpose_tpu.preprocess.segmentation import (GrabCutBackend,
                                                        segment_with_tta)
    from latentpose_tpu.data.synthetic import render_face
    img = (render_face(1, 0, 64)[0] * 255).astype(np.uint8)
    backend = GrabCutBackend()
    mask = segment_with_tta(backend, img, scales=(1.0, 1.5))
    assert mask.shape == (64, 64)
    assert set(np.unique(mask)).issubset({0.0, 1.0})


def test_readers_roundtrip(tmp_path):
    import cv2
    from latentpose_tpu.preprocess.readers import ImageReader
    rng = np.random.RandomState(0)
    for i in range(3):
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"{i:03d}.png"), img[..., ::-1])
    reader = ImageReader.get_image_reader(tmp_path)
    frames = list(reader)
    assert len(frames) == 3
    assert frames[0][0].shape == (32, 32, 3)
    assert frames[0][1] == "000"


def test_crop_cli_end_to_end(tmp_path):
    """crop_as_in_dataset CLI over a folder with precomputed bboxes."""
    import cv2
    from latentpose_tpu.cli.crop_as_in_dataset import main as crop_main
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(0)
    bboxes = {}
    for i in range(2):
        img = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(src / f"f{i}.jpg"), img[..., ::-1])
        bboxes[f"f{i}"] = [30, 30, 90, 90]
    np.save(tmp_path / "bboxes.npy", bboxes, allow_pickle=True)

    dst = tmp_path / "out"
    n = crop_main([str(src), str(dst), "--crop-style", "latentpose",
                   "--image-size", "64",
                   "--bboxes_npy", str(tmp_path / "bboxes.npy"),
                   "--weights_dir", ""])
    assert n == 2
    outs = sorted(dst.iterdir())
    assert len(outs) == 2
    out = cv2.imread(str(outs[0]))
    assert out.shape == (64, 64, 3)


@pytest.mark.slow
def test_graphonomy_architecture():
    import jax
    import jax.numpy as jnp
    from latentpose_tpu.preprocess.graphonomy import Graphonomy, person_mask
    m = Graphonomy()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    probs = m.apply(v, x, train=False)
    assert probs.shape == (1, 64, 64, 20)
    np.testing.assert_allclose(float(probs.sum(-1).mean()), 1.0, rtol=1e-5)
    mask = person_mask(probs)
    assert mask.shape == (1, 64, 64)
    assert 0.0 <= float(mask.min()) and float(mask.max()) <= 1.0


def test_s3fd_decode_and_nms():
    import jax.numpy as jnp
    from latentpose_tpu.preprocess.s3fd import (STRIDES, SCALES,
                                                decode_detections, nms)
    # fabricate head outputs: one confident face on head 1 (stride 8,
    # scale 32) at cell (4, 6), zero regression offsets
    outputs = []
    for i, stride in enumerate(STRIDES):
        size = 64 // stride
        cls = np.zeros((1, size, size, 2), np.float32)
        reg = np.zeros((1, size, size, 4), np.float32)
        if i == 1:
            cls[0, 4, 6, 1] = 0.9
        outputs.append((jnp.asarray(cls), jnp.asarray(reg)))
    boxes = decode_detections(outputs, threshold=0.5)
    assert boxes.shape == (1, 5)
    l, t, r, b, score = boxes[0]
    # center = cell * stride + stride/2; box side = scale
    assert abs((l + r) / 2 - (6 * 8 + 4)) < 1e-4
    assert abs((t + b) / 2 - (4 * 8 + 4)) < 1e-4
    assert abs((r - l) - 32) < 1e-4
    assert score == pytest.approx(0.9)

    # NMS: overlapping boxes collapse to the highest-scoring one
    cand = np.array([[0, 0, 10, 10, 0.9],
                     [1, 1, 11, 11, 0.8],     # IoU ~0.68 with first
                     [50, 50, 60, 60, 0.7]], np.float32)
    kept = nms(cand, iou_threshold=0.3)
    assert len(kept) == 2
    assert kept[0][4] == pytest.approx(0.9)
    assert kept[1][4] == pytest.approx(0.7)
