"""Build + ctypes-bind the native host-ops library on demand.

Replaces the reference's manual compile scripts (utils/compile_op.sh,
utils/cpp_wrappers/compile_wrappers.sh): the shared library is compiled
once, cached by source mtime, and bound with ctypes (no pybind11 in this
image).  Failures degrade gracefully — callers fall back to numpy/scipy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "src", "crfconv_native.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "lib")
_LIB = os.path.join(_LIB_DIR, "libcrfconv_native.so")

_lock = threading.Lock()
_lib = None


def _build() -> str:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-fopenmp",
        "-march=native", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)

        i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

        lib.ccn_knn_batch.argtypes = [f32p, i64, i64, f32p, i64, i64, i32p]
        lib.ccn_knn_batch.restype = None

        lib.ccn_knn_batch_distance_pick.argtypes = [
            f32p, i64, i64, i64, i64, ctypes.c_uint64, f32p, i32p,
        ]
        lib.ccn_knn_batch_distance_pick.restype = None

        lib.ccn_grid_subsample.argtypes = [
            f32p, i64, ctypes.c_void_p, i64, ctypes.c_void_p,
            ctypes.c_float, f32p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.ccn_grid_subsample.restype = i64

        _lib = lib
        return lib


class _KnnModule:
    """knn_batch / knn_batch_distance_pick bound to the native lib."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib

    def knn_batch(
        self, support: np.ndarray, query: np.ndarray, k: int
    ) -> np.ndarray:
        support = np.ascontiguousarray(support, np.float32)
        query = np.ascontiguousarray(query, np.float32)
        B, N, _ = support.shape
        M = query.shape[1]
        out = np.empty((B, M, k), np.int32)
        self._lib.ccn_knn_batch(support, B, N, query, M, k, out)
        return out

    def knn_batch_distance_pick(
        self, points: np.ndarray, nqueries: int, k: int, seed: int = 0
    ):
        points = np.ascontiguousarray(points, np.float32)
        B, N, _ = points.shape
        queries = np.empty((B, nqueries, 3), np.float32)
        idx = np.empty((B, nqueries, k), np.int32)
        self._lib.ccn_knn_batch_distance_pick(
            points, B, N, nqueries, k, seed, queries, idx
        )
        return queries, idx


def load_knn() -> _KnnModule:
    return _KnnModule(_load())


def load_subsample():
    lib = _load()

    def grid_subsample(points, features=None, labels=None, grid_size=0.1):
        points = np.ascontiguousarray(points, np.float32)
        n = points.shape[0]
        fdim = 0 if features is None else features.shape[1]
        out_pts = np.empty((n, 3), np.float32)
        out_feats = (
            np.empty((n, fdim), np.float32) if features is not None else None
        )
        out_labels = np.empty((n,), np.int32) if labels is not None else None
        # keep the contiguous copies referenced for the duration of the call
        feats_arr = (
            None
            if features is None
            else np.ascontiguousarray(features, np.float32)
        )
        labels_arr = (
            None if labels is None else np.ascontiguousarray(labels, np.int32)
        )
        count = lib.ccn_grid_subsample(
            points, n,
            None if feats_arr is None else feats_arr.ctypes.data,
            fdim,
            None if labels_arr is None else labels_arr.ctypes.data,
            ctypes.c_float(grid_size), out_pts,
            None if out_feats is None else out_feats.ctypes.data,
            None if out_labels is None else out_labels.ctypes.data,
        )
        result = [out_pts[:count].copy()]
        if out_feats is not None:
            result.append(out_feats[:count].copy())
        if out_labels is not None:
            result.append(out_labels[:count].copy())
        return result[0] if len(result) == 1 else tuple(result)

    return grid_subsample
