"""C++ host-side kernels via ctypes (see native/gdm_native.cpp).

Replaces the reference's vendored native extensions on the host paths:
nanoflann KNN (models/RandLA/utils/nearest_neighbors) used by GT
generation / mesh-graph build, and the voxel-grid subsampler
(cpp_wrappers/cpp_subsampling).  The library is compiled on first use
with g++ (-O3 -fopenmp) and cached next to the source; every entry point
has a scipy/numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_SRC = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                "native", "gdm_native.cpp")
_LIB_PATH = osp.join(osp.dirname(_SRC), "libgdm_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _fresh() -> bool:
    return osp.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= \
        os.path.getmtime(_SRC)


def _build() -> str | None:
    """Compile the library if stale.  Cross-process safe: an exclusive
    flock serialises concurrent builders (N process-pool workers on
    first use), and the compiler writes to a temp path that is
    os.replace'd atomically so no process ever dlopens a half-written
    .so.  The .so is a build artifact (gitignored) — it is compiled
    with -march=native, so a committed binary would SIGILL on hosts
    without this machine's ISA extensions."""
    if _fresh():
        return _LIB_PATH
    import fcntl

    with open(_LIB_PATH + ".lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        if _fresh():                 # another process built it meanwhile
            return _LIB_PATH
        tmp = f"{_LIB_PATH}.tmp{os.getpid()}"
        for extra in (["-march=native", "-fopenmp"], []):
            try:
                subprocess.run(
                    ["g++", "-O3", *extra, "-shared", "-fPIC",
                     "-std=c++17", _SRC, "-o", tmp],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, _LIB_PATH)
                return _LIB_PATH
            except (subprocess.SubprocessError, FileNotFoundError):
                continue
        return None


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        i32 = ctypes.c_int32
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.gdm_knn.argtypes = [fp, i32, fp, i32, i32, ip, fp]
        lib.gdm_radius_nn1.argtypes = [fp, i32, fp, i32,
                                       ctypes.c_float, ip, fp]
        lib.gdm_knn_batch.argtypes = [fp, i32, i32, fp, i32, i32, ip]
        lib.gdm_grid_subsample.argtypes = [fp, i32, fp, i32,
                                           ctypes.c_float, fp, fp]
        lib.gdm_grid_subsample.restype = i32
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def _as_f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def knn(support: np.ndarray, query: np.ndarray, k: int,
        return_dist: bool = False):
    """Exact k-NN on the host: [n,3] support, [m,3] query -> idx [m,k]
    (ascending distance).  nanoflann knn_batch parity for b=1
    (models/RandLA/helper_tool.py:161-171)."""
    lib = _get_lib()
    support = _as_f32(support)
    query = _as_f32(query)
    m, k = query.shape[0], int(k)
    if len(support) == 0 or k <= 0:
        # fail deterministically: the C path would early-return leaving
        # the np.empty output uninitialised, the scipy path raises a
        # different error deep in cKDTree
        raise ValueError(
            f"knn: empty support or k={k} (support {support.shape})")
    if lib is None:
        from scipy.spatial import cKDTree

        dist, idx = cKDTree(support).query(query, k=min(k, len(support)))
        idx = np.atleast_2d(np.asarray(idx, np.int32).reshape(m, -1))
        dist = np.atleast_2d(np.asarray(dist, np.float32).reshape(m, -1))
        if idx.shape[1] < k:   # wrap-pad like the C path
            reps = k - idx.shape[1]
            idx = np.concatenate(
                [idx, np.repeat(idx[:, -1:], reps, 1)], axis=1)
            dist = np.concatenate(
                [dist, np.repeat(dist[:, -1:], reps, 1)], axis=1)
        return (idx, dist) if return_dist else idx
    idx = np.empty((m, k), np.int32)
    dist = np.empty((m, k), np.float32) if return_dist else None
    fp = ctypes.POINTER(ctypes.c_float)
    lib.gdm_knn(
        support.ctypes.data_as(fp), support.shape[0],
        query.ctypes.data_as(fp), m, k,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dist.ctypes.data_as(fp) if return_dist else
        ctypes.cast(None, fp))
    return (idx, dist) if return_dist else idx


def radius_nn(support: np.ndarray, query: np.ndarray,
              radius: float) -> np.ndarray:
    """Radius-bounded exact 1-NN: [n,3] support, [m,3] query -> idx [m]
    with -1 where no support point lies within `radius` (inclusive).

    Output contract == ``knn(support, query, 1)`` followed by discarding
    matches with dist > radius — but via a 27-cell voxel-grid lookup
    instead of a KD-tree build + backtracking search, which is ~10x
    faster on the hot GT-correspondence path (data/gt_gen.py: matches
    beyond nn_dist_th are rejected anyway, linemod_pbr.py:641)."""
    lib = _get_lib()
    support = _as_f32(support)
    query = _as_f32(query)
    m = query.shape[0]
    if len(support) == 0:
        raise ValueError(f"radius_nn: empty support (radius {radius})")
    if lib is None:
        idx, dist = knn(support, query, 1, return_dist=True)
        idx = idx[:, 0].astype(np.int32, copy=True)
        idx[dist[:, 0] > radius] = -1
        return idx
    idx = np.empty(m, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.gdm_radius_nn1(
        support.ctypes.data_as(fp), support.shape[0],
        query.ctypes.data_as(fp), m, ctypes.c_float(radius),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.cast(None, fp))
    return idx


def knn_batch(support: np.ndarray, query: np.ndarray, k: int) -> np.ndarray:
    """[b,n,3], [b,m,3] -> [b,m,k] (reference knn_batch contract)."""
    lib = _get_lib()
    support = _as_f32(support)
    query = _as_f32(query)
    b, n, _ = support.shape
    m = query.shape[1]
    if lib is None:
        return np.stack([knn(support[i], query[i], k) for i in range(b)])
    idx = np.empty((b, m, k), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.gdm_knn_batch(
        support.ctypes.data_as(fp), b, n, query.ctypes.data_as(fp), m,
        int(k), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return idx


def grid_subsample(pts: np.ndarray, dl: float,
                   features: np.ndarray | None = None):
    """Voxel-grid barycenter subsampling (DP.grid_sub_sampling parity,
    models/RandLA/helper_tool.py:199-219).  Returns (sub_pts[, sub_feat])."""
    lib = _get_lib()
    pts = _as_f32(pts)
    fdim = 0 if features is None else int(features.shape[1])
    if lib is None:
        # mirrors the C kernel exactly: same collision-free packed key
        # (21 bits/axis on min-offset indices) and the same
        # first-occurrence voxel ORDER, so callers see identical output
        # whether or not the toolchain is present
        mn = pts.min(0)
        g = np.floor((pts - mn) / dl).astype(np.int64)
        key = (g[:, 0] << 42) | (g[:, 1] << 21) | g[:, 2]
        _, first, inv = np.unique(key, return_index=True,
                                  return_inverse=True)
        rank = np.empty(len(first), np.int64)
        rank[np.argsort(first, kind="stable")] = np.arange(len(first))
        inv = rank[inv]
        n_out = len(first)
        counts = np.bincount(inv, minlength=n_out)[:, None]
        sub = np.zeros((n_out, 3), np.float64)
        np.add.at(sub, inv, pts)
        sub = (sub / counts).astype(np.float32)
        if features is None:
            return sub
        f = np.zeros((n_out, fdim), np.float64)
        np.add.at(f, inv, features)
        return sub, (f / counts).astype(np.float32)
    features_f = _as_f32(features) if features is not None else None
    fp = ctypes.POINTER(ctypes.c_float)
    fptr = features_f.ctypes.data_as(fp) if features_f is not None \
        else ctypes.cast(None, fp)
    n_out = lib.gdm_grid_subsample(
        pts.ctypes.data_as(fp), pts.shape[0], fptr, fdim,
        ctypes.c_float(dl), ctypes.cast(None, fp), ctypes.cast(None, fp))
    out_pts = np.empty((n_out, 3), np.float32)
    out_f = np.empty((n_out, fdim), np.float32) if features is not None \
        else None
    lib.gdm_grid_subsample(
        pts.ctypes.data_as(fp), pts.shape[0], fptr, fdim,
        ctypes.c_float(dl), out_pts.ctypes.data_as(fp),
        out_f.ctypes.data_as(fp) if out_f is not None
        else ctypes.cast(None, fp))
    if features is None:
        return out_pts
    return out_pts, out_f
