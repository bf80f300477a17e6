"""Voxel-grid subsampling (host-side, ahead-of-time preprocessing).

API mirrors the reference's cpp_subsampling.compute wrapper
(utils/cpp_wrappers/cpp_subsampling/wrapper.cpp:70-76): given points and
optional features / labels, returns one representative point per occupied
voxel — the barycenter — with features averaged and labels decided by
per-voxel majority vote (grid_subsampling.cpp:50-103 semantics).

Uses the native C++ op when buildable; the vectorized numpy fallback has
identical semantics (up to voxel output order, which is unspecified in
both) and doubles as the golden oracle in tests.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native():
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from crfconv_tpu.ops import native_build

            _NATIVE = native_build.load_subsample()
        except Exception:
            _NATIVE = None
    return _NATIVE


def grid_subsample_numpy(
    points: np.ndarray,
    features: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    grid_size: float = 0.1,
):
    """Pure-numpy reference implementation (vectorized)."""
    points = np.asarray(points, np.float32)
    mn = points.min(axis=0)
    origin = np.floor(mn / grid_size) * grid_size
    ijk = np.floor((points - origin) / grid_size).astype(np.int64)
    nx = int(ijk[:, 0].max()) + 1
    ny = int(ijk[:, 1].max()) + 1
    key = ijk[:, 0] + nx * ijk[:, 1] + nx * ny * ijk[:, 2]

    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    nvox = uniq.shape[0]

    sums = np.zeros((nvox, 3), np.float64)
    np.add.at(sums, inv, points)
    sub_points = (sums / counts[:, None]).astype(np.float32)

    out = [sub_points]
    if features is not None:
        features = np.asarray(features, np.float32)
        fsums = np.zeros((nvox, features.shape[1]), np.float64)
        np.add.at(fsums, inv, features)
        out.append((fsums / counts[:, None]).astype(np.float32))
    if labels is not None:
        labels = np.asarray(labels).reshape(-1).astype(np.int64)
        # majority label per voxel: count (voxel, label) pairs
        lab_vals, lab_inv = np.unique(labels, return_inverse=True)
        pair = inv * lab_vals.shape[0] + lab_inv
        pair_uniq, pair_counts = np.unique(pair, return_counts=True)
        vox_of_pair = pair_uniq // lab_vals.shape[0]
        lab_of_pair = pair_uniq % lab_vals.shape[0]
        # ties broken toward the smaller label value: sort by
        # (voxel, count desc, label asc) and take the first row per voxel
        order = np.lexsort((lab_of_pair, -pair_counts, vox_of_pair))
        first = np.unique(vox_of_pair[order], return_index=True)[1]
        maj = lab_vals[lab_of_pair[order][first]]
        out.append(maj.astype(np.int32))
    return out[0] if len(out) == 1 else tuple(out)


def grid_subsample(
    points: np.ndarray,
    features: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    grid_size: float = 0.1,
):
    """Voxel-grid subsample (native C++ when available, else numpy)."""
    nat = _native()
    if nat is not None:
        return nat(points, features, labels, grid_size)
    return grid_subsample_numpy(points, features, labels, grid_size)
