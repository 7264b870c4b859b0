"""ctypes bindings for the native frame-preparation kernels
(`native/frame_loader.cpp`): undistortion remap + metric depth conversion.
"""
from __future__ import annotations

import ctypes

import numpy as np

from eggfusion_tpu.native import load

_lib = None


def _get():
    global _lib
    if _lib is None:
        lib = load("frame_loader")
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.ef_remap_u8.restype = None
        lib.ef_remap_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ef_remap_f32.restype = None
        lib.ef_remap_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p]
        lib.ef_depth_convert_u16.restype = None
        lib.ef_depth_convert_u16.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float, f32p,
        ]
        _lib = lib
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def remap(src: np.ndarray, mapx: np.ndarray, mapy: np.ndarray) -> np.ndarray:
    """Bilinear inverse remap (cv2.remap INTER_LINEAR equivalent).

    src: (H, W) or (H, W, C), uint8 or float32. Out-of-map pixels become 0.
    """
    lib = _get()
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    h, w, c = src.shape
    mapx = np.ascontiguousarray(mapx, np.float32)
    mapy = np.ascontiguousarray(mapy, np.float32)
    if src.dtype == np.uint8:
        src = np.ascontiguousarray(src)
        dst = np.empty_like(src)
        lib.ef_remap_u8(_ptr(src, ctypes.c_uint8), h, w, c,
                        _ptr(mapx, ctypes.c_float), _ptr(mapy, ctypes.c_float),
                        _ptr(dst, ctypes.c_uint8))
    else:
        src = np.ascontiguousarray(src, np.float32)
        dst = np.empty_like(src)
        lib.ef_remap_f32(_ptr(src, ctypes.c_float), h, w, c,
                         _ptr(mapx, ctypes.c_float), _ptr(mapy, ctypes.c_float),
                         _ptr(dst, ctypes.c_float))
    return dst[..., 0] if squeeze else dst


def depth_to_metric(raw: np.ndarray, depth_scale: float,
                    mapx: np.ndarray | None = None, mapy: np.ndarray | None = None,
                    min_m: float = 0.0, max_m: float = 1e9) -> np.ndarray:
    """uint16 raw depth -> float32 metric, optional nearest undistortion."""
    lib = _get()
    raw = np.ascontiguousarray(raw, np.uint16)
    h, w = raw.shape
    out = np.empty((h, w), np.float32)
    if mapx is not None:
        mapx = np.ascontiguousarray(mapx, np.float32)
        mapy = np.ascontiguousarray(mapy, np.float32)
        px, py = _ptr(mapx, ctypes.c_float), _ptr(mapy, ctypes.c_float)
    else:
        px = py = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    lib.ef_depth_convert_u16(
        _ptr(raw, ctypes.c_uint16), h, w, px, py,
        1.0 / float(depth_scale), float(min_m), float(max_m), _ptr(out, ctypes.c_float),
    )
    return out
