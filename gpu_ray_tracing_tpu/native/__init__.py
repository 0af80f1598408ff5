"""Native (C++) components: ctypes bindings with lazy compilation.

The C++ sources here compile on first use with g++ (the image's toolchain;
no pybind11, so bindings are plain C ABI + ctypes).  Every native component
has a pure-Python fallback — `available()` gates the fast path.

Components:
  - bvh_builder.cpp: binned-SAH BVH construction emitting the threaded flat
    layout of ops/bvh.py (the numpy median-split builder is the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "libbvh_builder.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _compile() -> str | None:
    """Compile the shared library if missing; returns an error string or None."""
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            text=True,
            timeout=120,
        )
        return None
    except FileNotFoundError:
        return "g++ not found"
    except subprocess.TimeoutExpired:
        return "g++ timed out"
    except subprocess.CalledProcessError as e:
        return f"g++ failed: {e.stderr[:500]}"


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _compile()
        if err is not None:
            _build_error = err
            return None
        lib = ctypes.CDLL(_LIB)
        lib.build_bvh_sah.restype = ctypes.c_int
        lib.build_bvh_sah.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # centroids
            ctypes.POINTER(ctypes.c_float),  # bounds_min
            ctypes.POINTER(ctypes.c_float),  # bounds_max
            ctypes.c_int32,  # n
            ctypes.c_int32,  # leaf_size
            ctypes.POINTER(ctypes.c_float),  # node_bmin
            ctypes.POINTER(ctypes.c_float),  # node_bmax
            ctypes.POINTER(ctypes.c_int32),  # miss_link
            ctypes.POINTER(ctypes.c_int32),  # leaf_start
            ctypes.POINTER(ctypes.c_int32),  # leaf_count
            ctypes.POINTER(ctypes.c_int32),  # order
            ctypes.POINTER(ctypes.c_int32),  # n_nodes_out
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native builder compiled and loaded."""
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def build_bvh_sah(
    centroids: np.ndarray,
    bounds_min: np.ndarray,
    bounds_max: np.ndarray,
    leaf_size: int = 4,
):
    """Binned-SAH build; returns the same tuple layout as the numpy builder:
    (node_bmin, node_bmax, miss_link, leaf_start, leaf_count, order)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native BVH builder unavailable: {_build_error}")
    n = centroids.shape[0]
    cent = np.ascontiguousarray(centroids, np.float32)
    bmin = np.ascontiguousarray(bounds_min, np.float32)
    bmax = np.ascontiguousarray(bounds_max, np.float32)
    cap = max(1, 2 * n - 1)
    node_bmin = np.empty((cap, 3), np.float32)
    node_bmax = np.empty((cap, 3), np.float32)
    miss = np.empty((cap,), np.int32)
    start = np.empty((cap,), np.int32)
    count = np.empty((cap,), np.int32)
    order = np.empty((n,), np.int32)
    n_nodes = np.zeros((1,), np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.build_bvh_sah(
        ptr(cent, ctypes.c_float), ptr(bmin, ctypes.c_float), ptr(bmax, ctypes.c_float),
        np.int32(n), np.int32(leaf_size),
        ptr(node_bmin, ctypes.c_float), ptr(node_bmax, ctypes.c_float),
        ptr(miss, ctypes.c_int32), ptr(start, ctypes.c_int32),
        ptr(count, ctypes.c_int32), ptr(order, ctypes.c_int32),
        ptr(n_nodes, ctypes.c_int32),
    )
    if rc != 0:
        raise RuntimeError(f"native BVH build failed (rc={rc})")
    m = int(n_nodes[0])
    return (
        node_bmin[:m].copy(), node_bmax[:m].copy(), miss[:m].copy(),
        start[:m].copy(), count[:m].copy(), order.astype(np.int64),
    )
