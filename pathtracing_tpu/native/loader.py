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


# ---------------------------------------------------------------------------
# Native OBJ geometry parser (obj_parser.cpp)
# ---------------------------------------------------------------------------

_OBJ_SRC = _HERE / "obj_parser.cpp"
_obj_lib = None
_obj_tried = False


def _get_obj_lib():
    global _obj_lib, _obj_tried
    with _lock:
        if _obj_tried:
            return _obj_lib
        _obj_tried = True
        src = _OBJ_SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        out = _HERE / f"_obj_parser_{tag}.so"
        if not out.exists():
            cmd = ["g++", "-O3", "-march=native", "-std=c++20", "-shared",
                   "-fPIC", str(_OBJ_SRC), "-o", str(out)]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=300)
            except (subprocess.SubprocessError, FileNotFoundError, OSError):
                return None
        lib = ctypes.CDLL(str(out))
        lib.obj_open.restype = ctypes.c_void_p
        lib.obj_open.argtypes = [ctypes.c_char_p]
        lib.obj_counts.restype = None
        lib.obj_counts.argtypes = [ctypes.c_void_p] + \
            [ctypes.POINTER(ctypes.c_int64)] * 8
        lib.obj_fill.restype = None
        lib.obj_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p,
            ctypes.c_char_p]
        lib.obj_free.restype = None
        lib.obj_free.argtypes = [ctypes.c_void_p]
        _obj_lib = lib
        return _obj_lib


def native_parse_obj(path):
    """Parse OBJ geometry with the C++ parser.  Returns dict(v [V,3] f32,
    vn [N,3] f32, vt [T,2] f32, tri [F,3,3] i64 (vi,ti,ni; -1 absent),
    tri_mat [F] i32 (usemtl index, -1 none), usemtl [list[str]],
    mtllib [list[str]]) or None when the toolchain is unavailable."""
    lib = _get_obj_lib()
    if lib is None:
        return None
    h = lib.obj_open(str(path).encode())
    if not h:
        return None
    try:
        c = [ctypes.c_int64(0) for _ in range(8)]
        lib.obj_counts(h, *[ctypes.byref(x) for x in c])
        nv, nvn, nvt, ntri, n_use, use_b, n_lib, lib_b = \
            [int(x.value) for x in c]
        v = np.empty((nv, 3), np.float32)
        vn = np.empty((nvn, 3), np.float32)
        vt = np.empty((nvt, 2), np.float32)
        tri = np.empty((ntri, 3, 3), np.int64)
        tri_mat = np.empty((ntri,), np.int32)
        use_blob = ctypes.create_string_buffer(max(use_b, 1))
        lib_blob = ctypes.create_string_buffer(max(lib_b, 1))

        def p(a, t):
            return a.ctypes.data_as(ctypes.POINTER(t))

        lib.obj_fill(h, p(v, ctypes.c_float), p(vn, ctypes.c_float),
                     p(vt, ctypes.c_float), p(tri, ctypes.c_int64),
                     p(tri_mat, ctypes.c_int32), use_blob, lib_blob)
        usemtl = (use_blob.raw[:use_b].decode(errors="replace")
                  .split("\0")[:-1] if use_b else [])
        mtllib = (lib_blob.raw[:lib_b].decode(errors="replace")
                  .split("\0")[:-1] if lib_b else [])
        return dict(v=v, vn=vn, vt=vt, tri=tri, tri_mat=tri_mat,
                    usemtl=usemtl, mtllib=mtllib)
    finally:
        lib.obj_free(h)
