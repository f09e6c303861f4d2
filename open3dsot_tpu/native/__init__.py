"""ctypes bindings for the native host-geometry library (geomlib.cpp).

Auto-builds `libgeomlib.so` with g++ -O3 on first import if missing (build
takes <2 s; result cached next to the source). Every entry point has a numpy
fallback, so the framework works without a toolchain; `AVAILABLE` reports
which path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "geomlib.cpp")
_SO = os.path.join(_DIR, "libgeomlib.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    i64, f32p, f64p, u8p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8),
    )
    lib.crop_canonical.restype = i64
    lib.crop_canonical.argtypes = [f32p, i64, f64p, f64p, f64p, f32p]
    lib.aabb_mask.restype = i64
    lib.aabb_mask.argtypes = [f32p, i64, f64p, f64p, u8p]
    lib.points_in_box.restype = None
    lib.points_in_box.argtypes = [f32p, i64, f64p, f64p, f64p, u8p]
    lib.box_cloud.restype = None
    lib.box_cloud.argtypes = [f32p, i64, f64p, f32p]
    lib.gather_rows.restype = None
    lib.gather_rows.argtypes = [f32p, i64, i64, ctypes.POINTER(ctypes.c_int64), i64, f32p]
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.quantize_per_sample.restype = None
    lib.quantize_per_sample.argtypes = [f32p, u8p, i64, i64, i16p, f32p, f32p]
    _lib = lib
    return lib


def _f32c(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _f64c(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def available() -> bool:
    return _load() is not None


def crop_canonical(points_n3: np.ndarray, rot_world_to_local: np.ndarray,
                   center: np.ndarray, half: np.ndarray) -> np.ndarray:
    """Fused (p - c) @ R^T + strict AABB crop. points (N, 3) -> (K, 3) f32."""
    lib = _load()
    pts = _f32c(points_n3)
    n = len(pts)
    if lib is None:
        local = (pts.astype(np.float64) - center) @ np.asarray(rot_world_to_local).T
        m = np.all((local < half) & (local > -np.asarray(half)), axis=1)
        return local[m].astype(np.float32)
    out = np.empty_like(pts)
    kept = lib.crop_canonical(
        pts.ctypes.data_as(lib.crop_canonical.argtypes[0]),
        n,
        _f64c(rot_world_to_local).ctypes.data_as(lib.crop_canonical.argtypes[2]),
        _f64c(center).ctypes.data_as(lib.crop_canonical.argtypes[3]),
        _f64c(half).ctypes.data_as(lib.crop_canonical.argtypes[4]),
        out.ctypes.data_as(lib.crop_canonical.argtypes[5]),
    )
    return out[:kept]


def points_in_box_native(points_n3: np.ndarray, rot_world_to_local: np.ndarray,
                         center: np.ndarray, half: np.ndarray) -> np.ndarray:
    """Inclusive oriented in-box mask (N,) bool."""
    lib = _load()
    pts = _f32c(points_n3)
    n = len(pts)
    if lib is None:
        local = (pts.astype(np.float64) - center) @ np.asarray(rot_world_to_local).T
        return np.all(np.abs(local) <= half, axis=1)
    mask = np.empty(n, dtype=np.uint8)
    lib.points_in_box(
        pts.ctypes.data_as(lib.points_in_box.argtypes[0]),
        n,
        _f64c(rot_world_to_local).ctypes.data_as(lib.points_in_box.argtypes[2]),
        _f64c(center).ctypes.data_as(lib.points_in_box.argtypes[3]),
        _f64c(half).ctypes.data_as(lib.points_in_box.argtypes[4]),
        mask.ctypes.data_as(lib.points_in_box.argtypes[5]),
    )
    return mask.astype(bool)


def quantize_per_sample_native(pts: np.ndarray, valid: np.ndarray):
    """Single-pass native twin of utils/quant.quantize_per_sample —
    bit-exact (same f32 arithmetic, round-half-to-even). pts (B, ..., 3)
    f32 + valid (B, ...) bool -> (q int16 like pts, scale (B,), off (B, 3)).
    Returns None when the native lib is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    pts = _f32c(pts)
    B = pts.shape[0]
    flat = pts.reshape(B, -1, 3)
    v = np.ascontiguousarray(
        np.asarray(valid, bool).reshape(B, -1), dtype=np.uint8
    )
    m = flat.shape[1]
    q = np.empty(flat.shape, dtype=np.int16)
    scale = np.empty((B,), dtype=np.float32)
    off = np.empty((B, 3), dtype=np.float32)
    a = lib.quantize_per_sample.argtypes
    lib.quantize_per_sample(
        flat.ctypes.data_as(a[0]), v.ctypes.data_as(a[1]), B, m,
        q.ctypes.data_as(a[4]), scale.ctypes.data_as(a[5]),
        off.ctypes.data_as(a[6]),
    )
    return q.reshape(pts.shape), scale, off


def box_cloud_native(points_n3: np.ndarray, keypoints_9x3: np.ndarray) -> np.ndarray:
    """(N, 3) points, (9, 3) keypoints -> (N, 9) f32 distances."""
    lib = _load()
    pts = _f32c(points_n3)
    if lib is None:
        diff = pts[:, None, :].astype(np.float64) - np.asarray(keypoints_9x3)[None]
        return np.sqrt((diff * diff).sum(-1)).astype(np.float32)
    out = np.empty((len(pts), 9), dtype=np.float32)
    lib.box_cloud(
        pts.ctypes.data_as(lib.box_cloud.argtypes[0]),
        len(pts),
        _f64c(keypoints_9x3).ctypes.data_as(lib.box_cloud.argtypes[2]),
        out.ctypes.data_as(lib.box_cloud.argtypes[3]),
    )
    return out
