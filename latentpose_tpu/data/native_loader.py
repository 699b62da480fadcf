"""ctypes binding for the native (C++) batch image loader.

``native/lpr_loader.cpp`` runs the input pipeline's hot loop (JPEG/PNG
decode, crop, bilinear resize, float conversion) in a C++ thread pool —
the TPU-native equivalent of the reference's jpeg4py/libjpeg-turbo + OpenCV
decode path (SURVEY.md §2.9).  The ctypes call releases the GIL, so Python
prefetch threads overlap with decoding.

Auto-builds the shared library on first use if g++ is available; callers
fall back to the cv2/PIL path when unavailable (``is_available()``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger("latentpose_tpu.data.native_loader")

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "liblpr_loader.so"

_lib = None
_load_failed = False


def _build():
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        logger.warning("Could not build native loader: %s", exc)
        return False


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.lpr_create.restype = ctypes.c_void_p
        lib.lpr_create.argtypes = [ctypes.c_int]
        lib.lpr_destroy.argtypes = [ctypes.c_void_p]
        lib.lpr_load_batch.restype = ctypes.c_int
        lib.lpr_load_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.lpr_load_cropped_batch.restype = ctypes.c_int
        lib.lpr_load_cropped_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        try:
            lib.lpr_load_cropped_batch_u8.restype = ctypes.c_int
            lib.lpr_load_cropped_batch_u8.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte)]
        except AttributeError:  # stale .so predating the u8 wire entry
            logger.warning("liblpr_loader.so lacks the u8 entry point — "
                           "rebuild with `make -C native` for the uint8 "
                           "wire fast path")
        _lib = lib
    except OSError as exc:
        logger.warning("Could not load native loader: %s", exc)
        _load_failed = True
    return _lib


def is_available() -> bool:
    return _get_lib() is not None


class NativeBatchLoader:
    """Decode+crop+resize a batch of image files into one float32 array."""

    def __init__(self, num_threads: int = 0):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        if num_threads <= 0:
            num_threads = max(2, os.cpu_count() or 2)
        self._pool = lib.lpr_create(num_threads)

    def load(self, paths, target_size, crops=None):
        """paths: list of file paths; crops: (N, 4) int (t, l, b, r) or None.

        Returns (images (N, target, target, 3) float32 in [0,1], n_failed).
        """
        n = len(paths)
        out = np.empty((n, target_size, target_size, 3), np.float32)
        c_paths = (ctypes.c_char_p * n)(
            *[str(p).encode("utf-8") for p in paths])
        crops_ptr = None
        if crops is not None:
            crops_arr = np.ascontiguousarray(crops, np.int32)
            crops_ptr = crops_arr.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int))
        failed = self._lib.lpr_load_batch(
            self._pool, c_paths, n, crops_ptr, target_size, target_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out, failed

    def load_cropped(self, paths, bboxes, has_bbox, out_size):
        """Dataset-parity path: decode -> bbox crop with blur-faded
        reflect101 padding (data/common/crop.py semantics, incl. the
        VoxCeleb2.1 1px border strip when ``has_bbox``) -> AREA/CUBIC
        resize.

        paths: N files; bboxes: (N, 4) float64 (l, t, r, b) in [0, 1]
        (already squared + 1.8-scaled); has_bbox: (N,) bool.
        Returns (images (N, out, out, 3) float32 in [0, 1], n_failed).
        """
        n = len(paths)
        out = np.empty((n, out_size, out_size, 3), np.float32)
        c_paths = (ctypes.c_char_p * n)(
            *[str(p).encode("utf-8") for p in paths])
        bb = np.ascontiguousarray(bboxes, np.float64)
        hb = np.ascontiguousarray(has_bbox, np.uint8)
        failed = self._lib.lpr_load_cropped_batch(
            self._pool, c_paths, n,
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            hb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out, failed

    def load_cropped_u8(self, paths, bboxes, has_bbox, out_size):
        """uint8 wire-format variant of :meth:`load_cropped`: the loader
        threads quantize the float result with the wire formula
        (floor(v*255+0.5) — runners/loop.quantize_batch_u8), so the batch
        needs no Python-side conversion before crossing host->device as
        bytes.  Returns (images (N, out, out, 3) uint8, n_failed)."""
        if not hasattr(self._lib, "lpr_load_cropped_batch_u8") or \
                self._lib.lpr_load_cropped_batch_u8.argtypes is None:
            f32, failed = self.load_cropped(paths, bboxes, has_bbox,
                                            out_size)
            return (f32 * 255.0 + 0.5).astype(np.uint8), failed
        n = len(paths)
        out = np.empty((n, out_size, out_size, 3), np.uint8)
        c_paths = (ctypes.c_char_p * n)(
            *[str(p).encode("utf-8") for p in paths])
        bb = np.ascontiguousarray(bboxes, np.float64)
        hb = np.ascontiguousarray(has_bbox, np.uint8)
        failed = self._lib.lpr_load_cropped_batch_u8(
            self._pool, c_paths, n,
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            hb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        return out, failed

    def __del__(self):
        if getattr(self, "_pool", None) and self._lib is not None:
            self._lib.lpr_destroy(self._pool)
            self._pool = None
