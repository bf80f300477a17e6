"""Host-side exact kNN — the framework's counterpart of the reference's
C++ nanoflann batch kNN (utils/nearest_neighbors/knn_.cxx).

Backend order:
  1. the native C++ KD-tree extension (native/knn, built from scratch —
     see crfconv_tpu.ops.native_build), parallelized with OpenMP;
  2. scipy cKDTree fallback (always available in this image).

Both return self-inclusive neighbor lists: when ``query is support`` the
first column is the query point itself, matching the convention the models
rely on (the CRF drops column 0 as the self-loop).
"""

from __future__ import annotations

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native():
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from crfconv_tpu.ops import native_build

            _NATIVE = native_build.load_knn()
        except Exception:
            _NATIVE = None
    return _NATIVE


def knn_batch(
    support: np.ndarray, query: np.ndarray, k: int
) -> np.ndarray:
    """Batched kNN: ``[B, N, 3] x [B, M, 3] -> int32 [B, M, k]``.

    Mirrors the reference API ``nearest_neighbors.knn_batch(support,
    query, K, omp=True)`` (utils/nearest_neighbors/knn.pyx:71-109).
    """
    support = np.ascontiguousarray(support, dtype=np.float32)
    query = np.ascontiguousarray(query, dtype=np.float32)
    assert support.ndim == 3 and query.ndim == 3, "expect [B, N, 3]"
    k = min(k, support.shape[1])

    nat = _native()
    if nat is not None:
        return nat.knn_batch(support, query, k)

    from scipy.spatial import cKDTree

    B, M = query.shape[0], query.shape[1]
    out = np.empty((B, M, k), dtype=np.int32)
    for b in range(B):
        tree = cKDTree(support[b])
        _, idx = tree.query(query[b], k=k, workers=-1)
        if k == 1:
            idx = idx[:, None]
        out[b] = idx.astype(np.int32)
    return out


def knn(support: np.ndarray, query: np.ndarray, k: int) -> np.ndarray:
    """Single-cloud kNN: ``[N, 3] x [M, 3] -> int32 [M, k]``."""
    return knn_batch(support[None], query[None], k)[0]
