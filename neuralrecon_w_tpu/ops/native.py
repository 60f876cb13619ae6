"""ctypes bindings for the C++ geometry runtime (csrc/geometry.cpp).

Build: `make -C csrc` (g++ only, no deps). Every entry point has a
vectorized-numpy fallback, so the package works without the library;
the native paths matter for production-scale inputs (millions of SFM
points, level-10 extraction grids) where numpy's materialized
intermediates dominate.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc", "libnwgeom.so",
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.nw_expand_quantize.restype = ctypes.c_int64
    lib.nw_expand_quantize.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
    ]
    lib.nw_marching_tetrahedra.restype = ctypes.c_int
    lib.nw_marching_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    if hasattr(lib, "nw_rasterize_depth"):
        lib.nw_rasterize_depth.restype = None
        lib.nw_rasterize_depth.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
        ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def expand_quantize(points: np.ndarray, origin: np.ndarray, scale: float,
                    voxel_size: float, level: int, expand: int) -> np.ndarray | None:
    """Occupied-cell morton codes (sorted) or None when the lib is absent."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    org = np.ascontiguousarray(origin, np.float64)
    cap = max(len(pts) * (2 * expand + 1) ** 3, 1024)
    while True:
        out = np.empty(cap, np.uint64)
        n = lib.nw_expand_quantize(
            _ptr(pts, ctypes.c_double), len(pts), _ptr(org, ctypes.c_double),
            float(scale), float(voxel_size), int(level), int(expand),
            _ptr(out, ctypes.c_uint64), cap,
        )
        if n >= 0:
            return out[:n]
        cap *= 2


def rasterize_depth_native(verts: np.ndarray, faces: np.ndarray,
                           c2w: np.ndarray, K: np.ndarray,
                           width: int, height: int,
                           znear: float = 1e-4) -> np.ndarray | None:
    """(h, w) z-buffer depth of a mesh from a NeRF-convention camera
    (0 = miss), or None when the library is absent/outdated."""
    lib = _load()
    if lib is None or not hasattr(lib, "nw_rasterize_depth"):
        return None
    v = np.ascontiguousarray(verts, np.float64)
    f = np.ascontiguousarray(faces, np.int64)
    pose = np.ascontiguousarray(np.asarray(c2w, np.float64)[:3, :4])
    depth = np.zeros(int(height) * int(width), np.float32)
    lib.nw_rasterize_depth(
        _ptr(v, ctypes.c_double), len(v),
        _ptr(f, ctypes.c_int64), len(f),
        _ptr(pose, ctypes.c_double),
        float(K[0, 0]), float(K[1, 1]), float(K[0, 2]), float(K[1, 2]),
        int(width), int(height), float(znear),
        _ptr(depth, ctypes.c_float),
    )
    return depth.reshape(int(height), int(width))


def marching_tetrahedra_native(sdf: np.ndarray, level: float = 0.0,
                               mask: np.ndarray | None = None):
    """(verts, faces) like ops.isosurface.marching_tetrahedra, or None."""
    lib = _load()
    if lib is None:
        return None
    field = np.ascontiguousarray(sdf, np.float32)
    d0, d1, d2 = field.shape
    m = None
    mptr = ctypes.POINTER(ctypes.c_uint8)()
    if mask is not None:
        m = np.ascontiguousarray(mask, np.uint8)
        mptr = _ptr(m, ctypes.c_uint8)

    max_v, max_f = 1 << 18, 1 << 19
    while True:
        verts = np.empty((max_v, 3), np.float64)
        faces = np.empty((max_f, 3), np.int64)
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        rc = lib.nw_marching_tetrahedra(
            _ptr(field, ctypes.c_float), mptr, d0, d1, d2, float(level),
            _ptr(verts, ctypes.c_double), max_v,
            _ptr(faces, ctypes.c_int64), max_f,
            ctypes.byref(nv), ctypes.byref(nf),
        )
        if rc == 0:
            return verts[: nv.value].copy(), faces[: nf.value].copy()
        max_v *= 4
        max_f *= 4
