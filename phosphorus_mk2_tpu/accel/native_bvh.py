"""ctypes binding for the native C++ BVH builder (native/bvh_builder.cpp).

Auto-compiles the shared library on first use (g++ is baked into the
image; pybind11 is not, hence the plain C ABI). Falls back to the numpy
builder on any failure — the output contract is identical and tested
equal (tests/test_native_bvh.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "bvh_builder.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libphbvh.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.abspath(_SRC)
        so = os.path.abspath(_SO)
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", so, src],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.bvh_build.restype = ctypes.c_void_p
            lib.bvh_build.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
            ]
            lib.bvh_counts.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.bvh_export.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.bvh_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def build_bvh_native(vertices: np.ndarray, faces: np.ndarray) -> dict | None:
    """Native build; returns the same dict as bvh_builder.build_bvh or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    handle = lib.bvh_build(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        f.shape[0],
    )
    try:
        n_nodes = ctypes.c_int64()
        n_leaf = ctypes.c_int64()
        lib.bvh_counts(handle, ctypes.byref(n_nodes), ctypes.byref(n_leaf))
        bmin = np.empty((n_nodes.value, 8, 3), np.float32)
        bmax = np.empty((n_nodes.value, 8, 3), np.float32)
        child = np.empty((n_nodes.value, 8), np.int32)
        count = np.empty((n_nodes.value, 8), np.int32)
        leaf = np.empty((n_leaf.value,), np.int32)
        lib.bvh_export(
            handle,
            bmin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            bmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            child.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            leaf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return {
            "node_bmin": bmin,
            "node_bmax": bmax,
            "node_child": child,
            "node_count": count,
            "leaf_tris": leaf,
        }
    finally:
        lib.bvh_free(handle)
