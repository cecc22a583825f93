"""ctypes loader (with lazy build) for the native host-ops library.

Builds ``libsherf_host.so`` from host_ops.cpp on first use when a C++
toolchain is available; all callers fall back to the NumPy implementations
when it is not (``lib() is None``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsherf_host.so")
_SRC = os.path.join(_DIR, "host_ops.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            l = ctypes.CDLL(_SO)
        except OSError:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        l.generate_rays.argtypes = [ctypes.c_int, ctypes.c_int, f32p, f32p,
                                    f32p, f32p, f32p]
        l.ray_aabb.argtypes = [ctypes.c_int64, f32p, f32p, f32p,
                               ctypes.c_float, f32p, f32p, u8p]
        l.fill_convex_poly.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p,
                                       ctypes.c_int]
        l.prepare_rays.argtypes = [ctypes.c_int, ctypes.c_int, f32p, f32p,
                                   f32p, f32p, ctypes.c_float, f32p, f32p,
                                   f32p, f32p, u8p]
        _lib = l
        return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def prepare_rays_native(H: int, W: int, K, R, T, bounds, margin: float = 0.01):
    """Native rays + AABB; returns None when the library is unavailable."""
    l = lib()
    if l is None:
        return None
    Kinv = np.ascontiguousarray(np.linalg.inv(K), np.float32)
    R = np.ascontiguousarray(R, np.float32)
    T = np.ascontiguousarray(np.reshape(T, (3,)), np.float32)
    b = np.ascontiguousarray(np.reshape(bounds, (6,)), np.float32)
    n = H * W
    rays_o = np.empty((n, 3), np.float32)
    rays_d = np.empty((n, 3), np.float32)
    near = np.empty((n,), np.float32)
    far = np.empty((n,), np.float32)
    mask = np.empty((n,), np.uint8)
    l.prepare_rays(H, W, _fp(Kinv), _fp(R), _fp(T), _fp(b),
                   ctypes.c_float(margin), _fp(rays_o), _fp(rays_d),
                   _fp(near), _fp(far), _u8(mask))
    return rays_o, rays_d, near, far, mask.astype(bool)


def fill_convex_poly_native(mask: np.ndarray, pts: np.ndarray) -> bool:
    l = lib()
    if l is None:
        return False
    pts = np.ascontiguousarray(pts, np.int32)
    l.fill_convex_poly(_u8(mask), mask.shape[0], mask.shape[1],
                       pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                       pts.shape[0])
    return True
