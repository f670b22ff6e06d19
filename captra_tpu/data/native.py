"""ctypes bindings for the native host data-prep core (native/pointops.cpp).

Compiled on first use with g++ into `native/_build/`; every entry point has
a numpy fallback (captra_tpu/data/numpy_ops.py) so the package works without
a toolchain.  pybind11 is deliberately avoided — plain C ABI + ctypes keeps
the build a single compiler invocation.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "_build", "libcaptra_pointops.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "pointops.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH, _SRC_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC_PATH):
            if not _build():
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.fps.argtypes = [f32p, i64, i64, i64, i64p]
        lib.dist_to_center.argtypes = [f32p, i64, f32p, f32p]
        lib.ball_indices.restype = ctypes.c_int64
        lib.ball_indices.argtypes = [f32p, i64, ctypes.c_float, i64p, i64]
        lib.backproject.restype = ctypes.c_int64
        lib.backproject.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint8),
            i64, i64, ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            f32p, ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def fps(xyz: np.ndarray, npoint: int, start: int = 0) -> np.ndarray:
    """Exact iterative FPS [N, 3] -> [npoint] int64 indices (native, or the
    numpy fallback)."""
    lib = get_lib()
    xyz = np.ascontiguousarray(xyz, np.float32)
    if lib is None:
        from captra_tpu.data.numpy_ops import _fps_numpy
        return _fps_numpy(xyz, npoint, np.random)
    out = np.empty(npoint, np.int64)
    lib.fps(_f32p(xyz), xyz.shape[0], npoint, start,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def backproject(depth: np.ndarray, intrinsics: np.ndarray,
                mask: np.ndarray | None = None, scale: float = 0.001):
    """Depth [H, W] uint16 -> (pts [H*W, 3], valid [H*W] bool), NOCS
    conventions.  Falls back to numpy."""
    lib = get_lib()
    depth = np.ascontiguousarray(depth, np.uint16)
    if lib is None:
        raise RuntimeError(
            "native backproject unavailable (no g++); use "
            "captra_tpu.data.preproc_nocs.backproject's numpy path")
    H, W = depth.shape
    k_inv = np.ascontiguousarray(np.linalg.inv(intrinsics), np.float64)
    pts = np.empty((H * W, 3), np.float32)
    valid = np.empty(H * W, np.uint8)
    mask_p = (np.ascontiguousarray(mask, np.uint8)
              .ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
              if mask is not None else
              ctypes.POINTER(ctypes.c_uint8)())
    lib.backproject(
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), mask_p,
        H, W, k_inv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        scale, _f32p(pts),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return pts, valid.astype(bool)
