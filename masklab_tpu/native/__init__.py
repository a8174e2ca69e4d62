"""Native (C++) helpers for the host-side data pipeline.

Builds ``rasterize.cpp`` into a shared object on first use (g++, cached
next to the source) and exposes it via ctypes. Everything degrades
gracefully to the cv2 implementations when a compiler is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'rasterize.cpp')
_SO = os.path.join(_HERE, '_rasterize.so')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC,
             '-o', _SO],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """Compile-on-demand loader; returns None when unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _build()
        if so is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(so)
        lib.fill_polygon.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_uint8]
        lib.fill_polygons.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_uint8]
        lib.row_extents.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def fill_polygon_native(mask: np.ndarray, points: np.ndarray,
                        value: int = 1) -> bool:
    """Fill ``points`` [N, 2] (x, y) into uint8 ``mask``; False if the
    native library is unavailable (caller should fall back to cv2)."""
    lib = load()
    if lib is None:
        return False
    mask = np.ascontiguousarray(mask)
    pts = np.ascontiguousarray(points, dtype=np.float64)
    lib.fill_polygon(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.shape[0], mask.shape[1],
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(pts), value)
    return True


def row_extents_native(mask: np.ndarray):
    """Row-wise nonzero extents; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    x_min = np.empty(h, np.int32)
    x_max = np.empty(h, np.int32)
    lib.row_extents(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        x_min.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        x_max.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return x_min, x_max
