"""ctypes bindings for the native sparse frontend (`native/sparse_frontend.cpp`).

Numpy-in / numpy-out wrappers around the C ABI:
  detect(gray)                        -> (keypoints (n, 3) f32, desc (n, 4) u64)
  track(prev, curr, depths, K, ...)   -> 4x4 delta (cam0 -> cam1) or None
"""
from __future__ import annotations

import ctypes

import numpy as np

from eggfusion_tpu.native import load

_lib = None


def _get():
    global _lib
    if _lib is None:
        lib = load("sparse_frontend")
        lib.ef_detect.restype = ctypes.c_int
        lib.ef_detect.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.ef_track.restype = ctypes.c_int
        lib.ef_track.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def detect(gray: np.ndarray, threshold: int = 20, max_kp: int = 1500):
    """FAST corners + oriented 256-bit descriptors for a (H, W) uint8 image."""
    lib = _get()
    gray = np.ascontiguousarray(gray, np.uint8)
    h, w = gray.shape
    kps = np.empty((max_kp, 3), np.float32)
    desc = np.empty((max_kp, 4), np.uint64)
    n = lib.ef_detect(
        _ptr(gray, ctypes.c_uint8), h, w, threshold, max_kp,
        _ptr(kps, ctypes.c_float), _ptr(desc, ctypes.c_uint64),
    )
    return kps[:n].copy(), desc[:n].copy()


def track(kp0, d0, kp1, d1, depth0, depth1, fx, fy, cx, cy,
          min_inliers: int = 15, inlier_thresh: float = 0.05):
    """Robust SE(3) delta (cam0 coords -> cam1 coords) or (None, 0)."""
    lib = _get()
    kp0 = np.ascontiguousarray(kp0, np.float32)
    kp1 = np.ascontiguousarray(kp1, np.float32)
    d0 = np.ascontiguousarray(d0, np.uint64)
    d1 = np.ascontiguousarray(d1, np.uint64)
    depth0 = np.ascontiguousarray(depth0, np.float32)
    depth1 = np.ascontiguousarray(depth1, np.float32)
    h, w = depth0.shape
    delta = np.empty(16, np.float32)
    n = lib.ef_track(
        _ptr(kp0, ctypes.c_float), _ptr(d0, ctypes.c_uint64), len(kp0),
        _ptr(kp1, ctypes.c_float), _ptr(d1, ctypes.c_uint64), len(kp1),
        _ptr(depth0, ctypes.c_float), _ptr(depth1, ctypes.c_float), h, w,
        float(fx), float(fy), float(cx), float(cy),
        int(min_inliers), float(inlier_thresh),
        _ptr(delta, ctypes.c_float),
    )
    if n <= 0:
        return None, 0
    return delta.reshape(4, 4).copy(), int(n)
