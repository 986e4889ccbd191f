"""ctypes loader for the native C++ BVH builder.

Compiles native/bvh_builder.cpp on first use with g++ (no pybind11 in the
image; plain C ABI + ctypes).  The .so is cached next to the source keyed
by a content hash, so rebuilds only happen when the source changes.  All
callers fall back to the NumPy builder when a toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "bvh_builder.cpp"
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _HERE / f"_bvh_builder_{tag}.so"
    if out.exists():
        return out
    cmd = ["g++", "-O3", "-march=native", "-std=c++20", "-shared", "-fPIC",
           "-pthread", str(_SRC), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None
    return out


def _get_lib():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _compile()
        if so is None:
            return None
        lib = ctypes.CDLL(str(so))
        lib.build_bvh_native.restype = ctypes.c_int
        lib.build_bvh_native.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def native_build_bvh(lo: np.ndarray, hi: np.ndarray, leaf_max: int):
    """Run the C++ builder. Returns (wide_lo, wide_hi, wide_child, order,
    max_depth) or None if the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    W = 8
    n = len(lo)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    max_nodes = n + 2
    order = np.empty(n, np.int64)
    wlo = np.empty((max_nodes, W, 3), np.float32)
    whi = np.empty((max_nodes, W, 3), np.float32)
    wchild = np.empty((max_nodes, W), np.int32)
    counts = np.zeros(2, np.int64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.build_bvh_native(
        p(lo, ctypes.c_float), p(hi, ctypes.c_float),
        ctypes.c_int64(n), ctypes.c_int32(leaf_max),
        ctypes.c_int64(max_nodes),
        p(order, ctypes.c_int64), p(wlo, ctypes.c_float),
        p(whi, ctypes.c_float), p(wchild, ctypes.c_int32),
        p(counts, ctypes.c_int64))
    if rc != 0:
        return None
    nn = int(counts[0])
    return (wlo[:nn].copy(), whi[:nn].copy(), wchild[:nn].copy(),
            order, int(counts[1]))
