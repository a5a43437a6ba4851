"""ctypes bindings to the native C++ runtime (native/libtpt_native.so).

The compute path is JAX/XLA/Pallas on TPU; host-side scene compilation (SAH
BVH construction — the reference's Rust builder, scene/src/bvh.rs:92-230) is
native C++ here.  If the shared library is missing we build it once with the
repo Makefile; if no toolchain is available we fall back to the pure-Python
builder in scene/bvh.py (same algorithm, same output contract).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpt_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               capture_output=True, timeout=120, check=True)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tpt_build_bvh.restype = ctypes.c_int
        lib.tpt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(tri_min: np.ndarray, tri_max: np.ndarray):
    """Native BVH build; returns a scene.bvh.FlatBVH or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    from .scene.bvh import FlatBVH

    n = len(tri_min)
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    max_nodes = max(2 * n, 1)
    bounds_min = np.empty((max_nodes, 3), np.float32)
    bounds_max = np.empty((max_nodes, 3), np.float32)
    left = np.empty(max_nodes, np.int32)
    right = np.empty(max_nodes, np.int32)
    count = np.empty(max_nodes, np.int32)
    order = np.empty(max(n, 1), np.int32)
    depth = np.zeros(1, np.int32)

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    n_nodes = lib.tpt_build_bvh(
        ptr(tri_min, ctypes.c_float), ptr(tri_max, ctypes.c_float), n,
        ptr(bounds_min, ctypes.c_float), ptr(bounds_max, ctypes.c_float),
        ptr(left, ctypes.c_int32), ptr(right, ctypes.c_int32),
        ptr(count, ctypes.c_int32), ptr(order, ctypes.c_int32),
        ptr(depth, ctypes.c_int32), max_nodes)
    if n_nodes < 0:
        return None
    return FlatBVH(bounds_min=bounds_min[:n_nodes].copy(),
                   bounds_max=bounds_max[:n_nodes].copy(),
                   left=left[:n_nodes].copy(), right=right[:n_nodes].copy(),
                   count=count[:n_nodes].copy(), order=order,
                   depth=int(depth[0]))
