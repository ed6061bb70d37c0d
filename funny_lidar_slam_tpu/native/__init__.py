"""ctypes loader for the native host runtime (native/flp_native.cpp).

The shared library is built on demand with g++ (`make -C native`, or
automatically here on first import). Every entry point has a NumPy fallback
so the framework stays functional without a compiler; the native paths are
the host-side hot loops (the reference runs these stages as C++ PSTL loops,
src/slam/preprocessing.cpp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "..", "..", "native", "flp_native.cpp")
_SO = os.path.join(_DIR, "libflp_native.so")

_lib = None


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64, f32 = ctypes.c_int64, ctypes.c_float
    pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.flp_filter_pad.restype = i64
    lib.flp_filter_pad.argtypes = [pf, ctypes.c_void_p, i64, f32, f32, i64, i64, pf, pf, pu8]
    lib.flp_voxel_downsample.restype = i64
    lib.flp_voxel_downsample.argtypes = [pf, i64, f32, i64, pf]
    lib.flp_extract_f32.restype = None
    lib.flp_extract_f32.argtypes = [pu8, i64, i64, i64, pf]
    lib.flp_extract_u16_to_i32.restype = None
    lib.flp_extract_u16_to_i32.argtypes = [pu8, i64, i64, i64, pi32]
    lib.flp_tile_indices.restype = None
    lib.flp_tile_indices.argtypes = [pf, i64, f32, pi32, pi32]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def filter_pad(points: np.ndarray, rel_times: np.ndarray | None,
               min_r: float, max_r: float, jump: int, capacity: int):
    """Range/jump filter + pad (native when possible).

    Returns (points [cap,3] f32, rel [cap] f32, mask [cap] bool, n_valid)."""
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is not None:
        out_p = np.empty((capacity, 3), np.float32)
        out_r = np.empty(capacity, np.float32)
        out_m = np.empty(capacity, np.uint8)
        rel_arg = None
        if rel_times is not None:
            rel_arg = np.ascontiguousarray(rel_times, np.float32)
        n = lib.flp_filter_pad(
            points, rel_arg.ctypes.data if rel_arg is not None else None,
            len(points), min_r, max_r, jump, capacity, out_p, out_r, out_m,
        )
        return out_p, out_r, out_m.astype(bool), int(n)
    # NumPy fallback
    r2 = np.einsum("ij,ij->i", points, points)
    keep = np.flatnonzero((r2 >= min_r * min_r) & (r2 <= max_r * max_r))
    if jump > 1:
        keep = keep[::jump]
    keep = keep[:capacity]
    out_p = np.zeros((capacity, 3), np.float32)
    out_r = np.zeros(capacity, np.float32)
    out_m = np.zeros(capacity, bool)
    out_p[: len(keep)] = points[keep]
    if rel_times is not None:
        out_r[: len(keep)] = np.asarray(rel_times, np.float32)[keep]
    out_m[: len(keep)] = True
    return out_p, out_r, out_m, len(keep)


def voxel_downsample(points: np.ndarray, voxel_size: float,
                     cap: int | None = None) -> np.ndarray:
    """Centroid voxel filter (native hash-map when possible)."""
    points = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    lib = _load()
    if lib is not None:
        cap = cap or len(points)
        out = np.empty((max(cap, 1), 3), np.float32)
        n = lib.flp_voxel_downsample(points, len(points), voxel_size, cap, out)
        return out[:n].copy()
    from ..io.pcd import voxel_downsample_np

    pts = voxel_downsample_np(points, voxel_size)
    return pts[:cap] if cap else pts
