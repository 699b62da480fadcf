"""Face croppers — parity with reference ``utils/crop_as_in_dataset.py``.

- ``LatentPoseFaceCropper`` (reference ``:202-281``): S³FD-detected (or
  given) bbox -> largest box -> square, x1.8 -> integer coords -> crop with
  blur-faded reflection padding (the same algorithm the dataloader uses,
  data/common/crop.py) -> resize; optional FAN landmarks, shifted/scaled
  into the crop.
- ``FFHQFaceCropper`` (reference ``:52-200``): landmark-aligned FFHQ-style
  crop: oriented quad from eye/mouth geometry, border+pad, blur-fade.

Detector/landmarker backends are injectable (weight-gated real nets live in
preprocess/s3fd.py and eval/fan.py; the hermetic path passes explicit
bboxes/landmarks).
"""

from __future__ import annotations

import logging
import math
from abc import ABC, abstractmethod

import numpy as np

from latentpose_tpu.data.common.crop import crop_with_padding

logger = logging.getLogger("latentpose_tpu.preprocess.croppers")


def choose_one_detection(frame_faces):
    """Pick the largest-area box; fallback box when none (reference
    ``:306-331``)."""
    if len(frame_faces) == 0:
        return [0, 0, 200, 200, 0.0]
    areas = [abs(f[2] - f[0]) * abs(f[1] - f[3]) for f in frame_faces]
    return list(np.asarray(frame_faces[int(np.argmax(areas))]))


class FaceCropper(ABC):
    def __init__(self, output_size=(256, 256), face_detector=None,
                 landmark_detector=None):
        self.output_size = tuple(output_size)
        self.face_detector = face_detector
        self.landmark_detector = landmark_detector

    @abstractmethod
    def crop_image(self, image, bbox=None, compute_landmarks=True):
        ...

    def _detect_bbox(self, image):
        if self.face_detector is None:
            raise RuntimeError(
                "No face-detector backend available (S3FD weights not "
                "converted) — pass an explicit bbox")
        return choose_one_detection(self.face_detector(image))[:4]

    def _detect_landmarks(self, image, bbox=None):
        if self.landmark_detector is None:
            raise RuntimeError(
                "No landmark backend available (FAN weights not converted) "
                "— run with compute_landmarks=False")
        return self.landmark_detector(image, bbox)


class LatentPoseFaceCropper(FaceCropper):
    def crop_image(self, image, bbox=None, compute_landmarks=True):
        """image: uint8 (H, W, 3) RGB; bbox: LTRB or None (detect).

        Returns (cropped uint8 output_size x 3, landmarks (68, 3) or None).
        """
        if bbox is None:
            bbox = self._detect_bbox(image)
        landmarks = None
        if compute_landmarks:
            landmarks = np.asarray(
                self._detect_landmarks(image, bbox), np.float32)

        l, t, r, b = bbox[:4]
        scale = 1.8
        cx, cy = (l + r) * 0.5, (t + b) * 0.5
        size = max(b - t, r - l) * scale
        l = math.floor(cx - size / 2)
        t = math.floor(cy - size / 2)
        r = math.ceil(cx + size / 2)
        b = math.ceil(cy + size / 2)
        b += (r - l) - (b - t)  # exactly square after rounding
        r += 1
        b += 1

        cropped = crop_with_padding(image, t, l, b, r)

        if landmarks is not None:
            landmarks = landmarks.copy()
            landmarks[:, 0] -= l
            landmarks[:, 1] -= t
            h_ratio = self.output_size[1] / cropped.shape[0]
            w_ratio = self.output_size[0] / cropped.shape[1]
            landmarks[:, 0] *= h_ratio
            landmarks[:, 1:] *= w_ratio  # Z scales too (reference :275-279)

        import cv2
        interp = (cv2.INTER_CUBIC
                  if self.output_size[1] > bbox[3] - bbox[1]
                  else cv2.INTER_AREA)
        cropped = cv2.resize(cropped, self.output_size, interpolation=interp)
        return cropped, landmarks


def ffhq_quad_from_landmarks(landmarks):
    """The FFHQ oriented crop rectangle from 68 landmarks (reference
    ``:115-146``).  Returns (quad (4, 2), qsize)."""
    lm = np.asarray(landmarks, np.float32)[:, :2]
    eye_left = lm[36:42].mean(axis=0)
    eye_right = lm[42:48].mean(axis=0)
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (lm[48] + lm[54]) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
    x /= np.hypot(*x)
    x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
    y = np.flipud(x) * [-1, 1]
    c = eye_avg + eye_to_mouth * 0.1
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    qsize = float(np.hypot(*x)) * 2
    return quad, qsize


class FFHQFaceCropper(FaceCropper):
    def crop_image(self, image, bbox=None, compute_landmarks=True):
        assert bbox is None, "NYI: custom bbox for FFHQFaceCropper"
        landmarks = np.asarray(self._detect_landmarks(image), np.float32)
        image, lm_cropped = self.crop_from_landmarks(image, landmarks)

        import cv2
        h_ratio = self.output_size[1] / image.shape[0]
        w_ratio = self.output_size[0] / image.shape[1]
        lm_cropped[:, 0] *= h_ratio
        lm_cropped[:, 1:] *= w_ratio
        image = cv2.resize(
            image, self.output_size,
            interpolation=cv2.INTER_CUBIC if h_ratio > 1.0
            else cv2.INTER_AREA)
        return image, lm_cropped if compute_landmarks else None

    @staticmethod
    def crop_from_landmarks(image, landmarks, only_landmarks=False):
        """FFHQ crop with blur-faded reflection padding (reference
        ``:97-156``)."""
        import cv2
        quad, qsize = ffhq_quad_from_landmarks(landmarks)
        lm_cropped = np.asarray(landmarks, np.float32).copy()

        border = max(round(qsize * 0.1), 3)
        x0 = int(np.floor(quad[:, 0].min())) - border
        y0 = int(np.floor(quad[:, 1].min())) - border
        x1 = int(np.ceil(quad[:, 0].max())) + border
        y1 = int(np.ceil(quad[:, 1].max())) + border

        pad = (max(-(x0 + border) + border, 0),
               max(-(y0 + border) + border, 0),
               max((x1 - border) - image.shape[1] + border, 0),
               max((y1 - border) - image.shape[0] + border, 0))

        lm_cropped[:, 0] -= x0
        lm_cropped[:, 1] -= y0
        if only_landmarks:
            return lm_cropped

        # crop (reflect-padding when the box exceeds the image)
        if x0 < 0 or y0 < 0 or x1 > image.shape[1] or y1 > image.shape[0]:
            image = cv2.copyMakeBorder(
                image, max(-y0, 0), max(y1 - image.shape[0], 0),
                max(-x0, 0), max(x1 - image.shape[1], 0),
                cv2.BORDER_REFLECT)
            x1 += max(-x0, 0)
            x0 += max(-x0, 0)
            y1 += max(-y0, 0)
            y0 += max(-y0, 0)
        out = image[y0:y1, x0:x1].astype(np.float32)

        h, w = out.shape[:2]
        y, x = np.ogrid[:h, :w]
        y, x = y.astype(np.float32), x.astype(np.float32)
        padf = np.array(pad, np.float32)
        padf[padf == 0] = 1e-10
        mask = np.maximum(
            1.0 - np.minimum(x / padf[0], (w - 1 - x) / padf[2]),
            1.0 - np.minimum(y / padf[1], (h - 1 - y) / padf[3]))[..., None]

        sigma = qsize * 0.02
        blurred = cv2.GaussianBlur(out, (0, 0), sigma,
                                   borderType=cv2.BORDER_REFLECT)
        out += (blurred - out) * np.clip(mask * 3.0 + 1.0, 0.0, 1.0)
        out += (np.median(out, axis=(0, 1)) - out) * np.clip(mask, 0.0, 1.0)
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
        return out, lm_cropped


def make_face_detector(weights_dir):
    """S3FD backend if converted weights exist, else None."""
    from latentpose_tpu.utils.weights import (find_weights_file,
                                              load_flat_npz_variables)
    path = find_weights_file("s3fd.npz", weights_dir)
    if path is None:
        return None
    import jax.numpy as jnp
    from latentpose_tpu.preprocess.s3fd import (S3FD, decode_detections,
                                                nms)
    model = S3FD()
    variables = load_flat_npz_variables(path)

    def detect(image_rgb_uint8):
        x = image_rgb_uint8.astype(np.float32) \
            - np.array([123.0, 117.0, 104.0], np.float32)
        outputs = model.apply(variables, jnp.asarray(x[None]))
        boxes = nms(decode_detections(outputs))
        return boxes.tolist()

    return detect


def make_cropper(style, output_size=(256, 256), weights_dir=None):
    from latentpose_tpu.utils.weights import find_weights_file
    face_detector = make_face_detector(weights_dir)
    landmark_backend = None
    fan_path = find_weights_file("fan_2d.npz", weights_dir)
    if fan_path is not None:
        from latentpose_tpu.eval.backends import FANBackend
        fan = FANBackend(fan_path)

        def landmark_backend(image, bbox=None):  # noqa: F811
            lm, _ = fan(image)
            return np.concatenate(
                [lm, np.zeros((68, 1), np.float32)], axis=1)

    if style == "latentpose":
        return LatentPoseFaceCropper(output_size, face_detector,
                                     landmark_backend)
    if style == "ffhq":
        return FFHQFaceCropper(output_size, face_detector, landmark_backend)
    raise ValueError(f"Unknown crop style {style!r}")
