"""ctypes bindings for the native host-side runtime ops (native/).

Auto-builds ``liblgtpu_native.so`` with make on first use (g++ only, no
external deps) and falls back to pure-numpy implementations if the
toolchain is unavailable, so the Python package never hard-requires the
native library.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[3] / "native"
_LIB_PATH = _NATIVE_DIR / "liblgtpu_native.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.preprocess_image.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.ransac_fundamental.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ransac_fundamental.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def preprocess_image(
    rgb: np.ndarray, out_hw: Tuple[int, int]
) -> np.ndarray:
    """(H, W, 3) uint8 RGB -> (out_h, out_w, 1) float32 gray in [0, 1],
    fused resize+grayscale+normalize (demo/demo_mono.cpp:146-162 analog)."""
    lib = _load()
    out_h, out_w = out_hw
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if lib is not None:
        out = np.empty((out_h, out_w), np.float32)
        lib.preprocess_image(
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rgb.shape[0],
            rgb.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h,
            out_w,
        )
        return out[..., None]
    # numpy fallback: nearest-bilinear via cv2-free interpolation
    from lightglue_tpu.utils.image import resize_image, rgb_to_grayscale

    resized, _ = resize_image(rgb, (out_h, out_w))
    return (rgb_to_grayscale(resized) / 255.0)[..., None].astype(np.float32)


def ransac_fundamental(
    pts0: np.ndarray,
    pts1: np.ndarray,
    max_iters: int = 500,
    threshold: float = 3.0,
    seed: int = 888,
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Fundamental-matrix RANSAC over matched points (the demo's
    cv::findFundamentalMat verification step, demo/demo_mono.cpp:339-346).

    Returns (num_inliers, inlier_mask bool (N,), F (3, 3))."""
    pts0 = np.ascontiguousarray(pts0, np.float32)
    pts1 = np.ascontiguousarray(pts1, np.float32)
    n = len(pts0)
    lib = _load()
    if lib is not None:
        mask = np.zeros(n, np.uint8)
        F = np.zeros(9, np.float64)
        count = lib.ransac_fundamental(
            pts0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pts1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            max_iters,
            threshold,
            seed,
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            F.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return count, mask.astype(bool), F.reshape(3, 3)
    try:  # cv2 fallback
        import cv2

        if n < 8:
            return 0, np.zeros(n, bool), np.zeros((3, 3))
        F, mask = cv2.findFundamentalMat(
            pts0, pts1, cv2.FM_RANSAC, threshold, 0.99, max_iters
        )
        if F is None:
            return 0, np.zeros(n, bool), np.zeros((3, 3))
        mask = mask.ravel().astype(bool)
        return int(mask.sum()), mask, F[:3]
    except Exception:
        return 0, np.zeros(n, bool), np.zeros((3, 3))
