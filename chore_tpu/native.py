"""ctypes bindings for the chorenat native geometry runtime (native/).

The native library replaces the reference's host-side native geometry deps
(igl exact mesh distance, sklearn KD-tree chamfer, trimesh surface sampling;
reference: preprocess/boundary_sampler.py:45-64,
recon/eval/chamfer_distance.py:10-52, recon/recon_fit_base.py:121) with a
single C++ shared object: triangle BVH closest-point queries, point KD-tree
1-NN, area-weighted surface sampling and bidirectional chamfer, all
OpenMP-parallel.

The library is built lazily from source with g++ the first time it's
needed; if no toolchain is available every entry point has a pure
numpy/JAX fallback at its call site (``available()`` gates usage).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libchorenat.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        src = os.path.join(_NATIVE_DIR, "chorenat.cpp")
        if not os.path.isfile(src):
            if not os.path.isfile(_SO_PATH):
                _build_failed = True
                return None
        else:
            # always invoke make: its mtime rule rebuilds a stale .so after
            # source edits and is a no-op otherwise
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, timeout=300,
                )
            except (subprocess.SubprocessError, FileNotFoundError):
                if not os.path.isfile(_SO_PATH):
                    _build_failed = True
                    return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None

        c_float_p = ctypes.POINTER(ctypes.c_float)
        c_int32_p = ctypes.POINTER(ctypes.c_int32)
        lib.chorenat_bvh_build.restype = ctypes.c_void_p
        lib.chorenat_bvh_build.argtypes = [
            c_float_p, ctypes.c_int64, c_int32_p, ctypes.c_int64,
        ]
        lib.chorenat_bvh_free.argtypes = [ctypes.c_void_p]
        lib.chorenat_bvh_query.argtypes = [
            ctypes.c_void_p, c_float_p, ctypes.c_int64,
            c_float_p, c_int32_p, c_float_p,
        ]
        lib.chorenat_kdtree_build.restype = ctypes.c_void_p
        lib.chorenat_kdtree_build.argtypes = [c_float_p, ctypes.c_int64]
        lib.chorenat_kdtree_free.argtypes = [ctypes.c_void_p]
        lib.chorenat_kdtree_query.argtypes = [
            ctypes.c_void_p, c_float_p, ctypes.c_int64, c_float_p, c_int32_p,
        ]
        lib.chorenat_sample_surface.argtypes = [
            c_float_p, c_int32_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, c_float_p,
        ]
        lib.chorenat_chamfer.restype = ctypes.c_float
        lib.chorenat_chamfer.argtypes = [
            c_float_p, ctypes.c_int64, c_float_p, ctypes.c_int64,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    """Whether the native runtime is (or can be) loaded."""
    return _load() is not None


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


class TriangleBVH:
    """AABB BVH over a triangle mesh with exact closest-point queries."""

    def __init__(self, verts, faces):
        lib = _load()
        if lib is None:
            raise RuntimeError("chorenat native library unavailable")
        self._lib = lib
        self._verts = _f32(verts)
        self._faces = _i32(faces)
        self._h = lib.chorenat_bvh_build(
            _ptr(self._verts, ctypes.c_float), len(self._verts),
            _ptr(self._faces, ctypes.c_int32), len(self._faces),
        )

    def query(self, points, want_faces=False, want_closest=False):
        """Unsigned distances (and optionally face indices / closest points)
        from each query point to the mesh."""
        pts = _f32(points)
        n = len(pts)
        dist = np.empty(n, np.float32)
        fidx = np.empty(n, np.int32) if want_faces else None
        closest = np.empty((n, 3), np.float32) if want_closest else None
        self._lib.chorenat_bvh_query(
            self._h, _ptr(pts, ctypes.c_float), n,
            _ptr(dist, ctypes.c_float),
            _ptr(fidx, ctypes.c_int32) if want_faces else None,
            _ptr(closest, ctypes.c_float) if want_closest else None,
        )
        out = [dist]
        if want_faces:
            out.append(fidx)
        if want_closest:
            out.append(closest)
        return out[0] if len(out) == 1 else tuple(out)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.chorenat_bvh_free(self._h)
            self._h = None


class PointKDTree:
    """KD-tree over a point set with batched 1-NN queries."""

    def __init__(self, points):
        lib = _load()
        if lib is None:
            raise RuntimeError("chorenat native library unavailable")
        self._lib = lib
        self._pts = _f32(points)
        self._h = lib.chorenat_kdtree_build(
            _ptr(self._pts, ctypes.c_float), len(self._pts)
        )

    def query(self, points):
        """(distances (N,), indices (N,)) of the nearest tree point."""
        pts = _f32(points)
        n = len(pts)
        dist = np.empty(n, np.float32)
        idx = np.empty(n, np.int32)
        self._lib.chorenat_kdtree_query(
            self._h, _ptr(pts, ctypes.c_float), n,
            _ptr(dist, ctypes.c_float), _ptr(idx, ctypes.c_int32),
        )
        return dist, idx

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.chorenat_kdtree_free(self._h)
            self._h = None


def point_mesh_udf(points, verts, faces):
    """(udf (N,), nearest_vertex_index (N,)) — native analog of
    chore_tpu.ops.point_mesh.point_mesh_udf for host-side callers."""
    bvh = TriangleBVH(verts, faces)
    udf = bvh.query(points)
    _, vidx = PointKDTree(verts).query(points)
    return udf, vidx


def sample_surface(verts, faces, n, seed=0):
    """Area-weighted surface sampling; native analog of
    chore_tpu.utils.meshio.sample_surface (deterministic in seed)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("chorenat native library unavailable")
    v = _f32(verts)
    f = _i32(faces)
    out = np.empty((n, 3), np.float32)
    lib.chorenat_sample_surface(
        _ptr(v, ctypes.c_float), _ptr(f, ctypes.c_int32), len(f), n,
        ctypes.c_uint64(seed), _ptr(out, ctypes.c_float),
    )
    return out


def chamfer(a, b):
    """Bidirectional sqrt chamfer, sum of directional means (the evaluation
    metric; reference: recon/eval/chamfer_distance.py:10-52)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("chorenat native library unavailable")
    aa, bb = _f32(a), _f32(b)
    return float(lib.chorenat_chamfer(
        _ptr(aa, ctypes.c_float), len(aa), _ptr(bb, ctypes.c_float), len(bb)
    ))
