"""Compile-on-first-use loader for the native kernels (ctypes, no pybind11).

The .so is cached next to the source keyed by a source hash; a failed
toolchain degrades gracefully (callers fall back to numpy paths).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "matcher.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(so_path: str) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", so_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Returns the loaded library, building it if needed; None if the
    toolchain is unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    cache_dir = os.environ.get("LOOPY_NATIVE_CACHE",
                               os.path.join(tempfile.gettempdir(),
                                            "loopy_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"libloopy_{tag}.so")
    if not os.path.exists(so_path):
        if not _build(so_path):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.hamming_mutual_matches.restype = ctypes.c_int
    lib.hamming_mutual_matches.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
    lib.march_tets.restype = ctypes.c_int
    lib.march_tets.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
    lib.raster_depth.restype = ctypes.c_int
    lib.raster_depth.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_void_p]
    lib.hamidx_create.restype = ctypes.c_void_p
    lib.hamidx_create.argtypes = []
    lib.hamidx_destroy.restype = None
    lib.hamidx_destroy.argtypes = [ctypes.c_void_p]
    lib.hamidx_size.restype = ctypes.c_int
    lib.hamidx_size.argtypes = [ctypes.c_void_p]
    lib.hamidx_add.restype = None
    lib.hamidx_add.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int, ctypes.c_int]
    lib.hamidx_query.restype = None
    lib.hamidx_query.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
    _LIB = lib
    return _LIB


class HammingIndex:
    """Incremental multi-index Hamming inverted index (16x16-bit substring
    tables, matcher.cpp) for place-recognition candidate retrieval. Raises
    RuntimeError at construction when the native toolchain is unavailable —
    callers fall back to brute-force scoring."""

    def __init__(self):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.hamidx_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.hamidx_destroy(self._h)
            self._h = None

    def add(self, des, anchor_id: int):
        import numpy as np

        des = np.ascontiguousarray(des, np.uint8)
        self._lib.hamidx_add(self._h, des.ctypes.data, len(des),
                             int(anchor_id))

    def query_votes(self, des, n_anchors: int):
        """Per-anchor candidate votes (n_anchors,) float32: number of query
        descriptors sharing >=1 exact 16-bit substring with any descriptor
        of that anchor."""
        import numpy as np

        votes = np.zeros(n_anchors, np.float32)
        if des is None or len(des) == 0 or n_anchors == 0:
            return votes
        des = np.ascontiguousarray(des, np.uint8)
        self._lib.hamidx_query(self._h, des.ctypes.data, len(des),
                               votes.ctypes.data, n_anchors)
        return votes


def hamming_mutual_match_count(a, b, max_dist: int) -> Optional[int]:
    """Count of mutual NN matches under max_dist; None if native missing."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    idx = np.empty(len(a), np.int32)
    dist = np.empty(len(a), np.int32)
    return int(lib.hamming_mutual_matches(
        a.ctypes.data, len(a), b.ctypes.data, len(b), max_dist,
        idx.ctypes.data, dist.ctypes.data))


def raster_mesh_depth(verts, faces, c2w, H: int, W: int, fx: float,
                      fy: float, cx: float, cy: float) -> Optional["np.ndarray"]:
    """Z-buffer depth render of a triangle mesh from pose c2w (repo camera
    convention, see ops/raster.py). (H, W) float32, 0 = no hit; None if the
    native toolchain is unavailable (callers fall back to point-splat)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    w2c = np.ascontiguousarray(np.linalg.inv(np.asarray(c2w, np.float64)))
    out = np.empty(H * W, np.float32)
    lib.raster_depth(verts.ctypes.data, len(verts), faces.ctypes.data,
                     len(faces), w2c.ctypes.data, H, W,
                     float(fx), float(fy), float(cx), float(cy),
                     out.ctypes.data)
    return out.reshape(H, W)


def march_tets_native(vol) -> Optional["np.ndarray"]:
    """Triangle soup (T,3,3) in voxel coords; None if native missing."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol, np.float32)
    X, Y, Z = vol.shape
    # exact mixed-cube count (all 8 corners finite, signs straddling zero)
    # -> worst case 12 triangles per cube (6 tets x 2)
    fin = np.isfinite(vol)
    neg = fin & (vol < 0)
    nonneg = fin & (vol >= 0)

    def _cube_all(a):
        return (a[:-1, :-1, :-1] & a[1:, :-1, :-1] & a[:-1, 1:, :-1]
                & a[:-1, :-1, 1:] & a[1:, 1:, :-1] & a[1:, :-1, 1:]
                & a[:-1, 1:, 1:] & a[1:, 1:, 1:])

    def _cube_any(a):
        return (a[:-1, :-1, :-1] | a[1:, :-1, :-1] | a[:-1, 1:, :-1]
                | a[:-1, :-1, 1:] | a[1:, 1:, :-1] | a[1:, :-1, 1:]
                | a[:-1, 1:, 1:] | a[1:, 1:, 1:])

    mixed_cubes = int((_cube_all(fin) & _cube_any(neg)
                       & _cube_any(nonneg)).sum())
    cap = mixed_cubes * 12 + 64
    out = np.empty((cap, 9), np.float32)
    n = lib.march_tets(vol.ctypes.data, X, Y, Z, out.ctypes.data, cap)
    return out[:n].reshape(n, 3, 3).astype(np.float64)
