"""ctypes bindings for the native runtime library (libacrt.so).

Every entry point returns None on any failure so callers can fall back to
the pure-python implementations (accel/bvh.py, scene/ply.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("ACRT_DISABLE_NATIVE"):
        return None
    try:
        from advanced_cpu_raytracing_tpu.native.build import build

        path = build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.acrt_build_bvh.restype = ctypes.c_int32
        lib.acrt_ply_open.restype = ctypes.c_int32
        lib.acrt_ply_read.restype = ctypes.c_int32
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _f32c(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def build_bvh_native(face_min, face_max, face_center):
    lib = _lib()
    if lib is None:
        return None
    n = len(face_center)
    if n == 0:
        return None
    cap = 2 * n - 1
    fmin, fmax, fctr = _f32c(face_min), _f32c(face_max), _f32c(face_center)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_left = np.empty(cap, np.int32)
    node_right = np.empty(cap, np.int32)
    node_first = np.empty(cap, np.int32)
    node_count = np.empty(cap, np.int32)
    order = np.empty(n, np.int32)
    max_depth = np.zeros(1, np.int32)

    p = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    num = lib.acrt_build_bvh(
        ctypes.c_int32(n), p(fmin), p(fmax), p(fctr),
        p(node_min), p(node_max), p(node_left), p(node_right),
        p(node_first), p(node_count), p(order), p(max_depth),
    )
    if num <= 0:
        return None
    from advanced_cpu_raytracing_tpu.accel.bvh import FlatBVH

    return FlatBVH(
        node_min=node_min[:num], node_max=node_max[:num],
        node_left=node_left[:num], node_right=node_right[:num],
        node_first=node_first[:num], node_count=node_count[:num],
        order=order, max_depth=int(max_depth[0]),
    )


def load_ply_native(path: str):
    lib = _lib()
    if lib is None:
        return None
    counts = np.zeros(8, np.int64)
    rc = lib.acrt_ply_open(
        path.encode(), counts.ctypes.data_as(ctypes.c_void_p)
    )
    if rc != 0:
        return None
    n_vert, n_rows = int(counts[0]), int(counts[1])
    verts = np.empty((n_vert, 3), np.float32)
    tris = np.empty((max(2 * n_rows, 1), 3), np.int32)
    nt = lib.acrt_ply_read(
        path.encode(), counts.ctypes.data_as(ctypes.c_void_p),
        verts.ctypes.data_as(ctypes.c_void_p),
        tris.ctypes.data_as(ctypes.c_void_p),
    )
    if nt < 0:
        return None
    return verts, np.ascontiguousarray(tris[:nt])
