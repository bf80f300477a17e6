"""Multiscale index-pyramid construction.

This is the TPU-native replacement for the reference's collate-time graph
building (datasets/s3dis_dataset.py:416-449): for each of ``num_scales``
levels compute a self-inclusive kNN ``neighbor_idx [B,N,K]``, subsample
the points by ``ratio`` (random, matching the reference default, or FPS),
record ``sub_idx`` (the chosen rows of neighbor_idx) and a k-NN ``up_idx``
back-pointer, then recurse on the subsampled positions.  All outputs are
fixed-shape int32 so the device graph never retraces.

Two implementations with identical semantics:
  * :func:`build_pyramid` — host-side numpy (scipy cKDTree or the native
    C++ KD-tree when built); feeds the input pipeline.
  * :func:`build_pyramid_jax` — jittable on-device version (tiled
    brute-force kNN); used for on-TPU benchmarking and small clouds.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from crfconv_tpu.data.batch import PointBatch, ScaleData

# Pyramid constants of the flagship ("big") path — reference
# datasets/s3dis_dataset.py:392-393.
BIG_KERNEL_SIZES = (16, 16, 16, 16, 16)
BIG_RATIOS = (4, 4, 4, 4, 2)


# --------------------------------------------------------------------------
# host-side kNN
# --------------------------------------------------------------------------

def knn_search(
    support: np.ndarray, query: np.ndarray, k: int
) -> np.ndarray:
    """Batched exact kNN on the host → int32 ``[B, M, k]``.

    API shape-compatible with the reference's C++
    ``nearest_neighbors.knn_batch`` (utils/nearest_neighbors/knn.pyx:71-109).
    Uses the native C++ KD-tree extension when available, else scipy.
    """
    from crfconv_tpu.ops import knn_host

    return knn_host.knn_batch(support, query, k)


def _fps_indices(pos: np.ndarray, n_samples: int, rng: np.random.Generator) -> np.ndarray:
    """Farthest-point sampling for one cloud ``[N, 3]`` → ``[n_samples]``.

    Host-side equivalent of the CUDA FPS the reference optionally uses
    (torch_points_kernels, datasets/s3dis_dataset.py:435).
    """
    n = pos.shape[0]
    sel = np.empty(n_samples, dtype=np.int64)
    sel[0] = rng.integers(n)
    d = np.sum((pos - pos[sel[0]]) ** 2, axis=1)
    for i in range(1, n_samples):
        sel[i] = int(np.argmax(d))
        nd = np.sum((pos - pos[sel[i]]) ** 2, axis=1)
        np.minimum(d, nd, out=d)
    return sel


def _dilate(
    neighbor_idx: np.ndarray, k: int, dilation: int, rng: np.random.Generator
) -> np.ndarray:
    """Random k-of-(k·dilation) neighbor selection, keeping col 0 = self.

    Statistical counterpart of the reference's dilated kNN graphs
    (models/point_conv.py:155-163: torch.randint over k·dilation columns).
    """
    if dilation <= 1:
        return neighbor_idx[..., :k]
    B, N, KD = neighbor_idx.shape
    cols = rng.integers(0, KD, size=(B, N, k - 1))
    picked = np.take_along_axis(neighbor_idx, cols, axis=2)
    return np.concatenate([neighbor_idx[..., :1], picked], axis=2)


def build_pyramid(
    pos: np.ndarray,
    kernel_sizes: Sequence[int] = BIG_KERNEL_SIZES,
    ratios: Sequence[int] = BIG_RATIOS,
    *,
    k_up: int = 1,
    dilations: Optional[Sequence[int]] = None,
    method: str = "random",
    rng: Optional[np.random.Generator] = None,
) -> Tuple[ScaleData, ...]:
    """Build the multiscale pyramid on the host.

    Args:
      pos:          [B, N, 3] float32 positions.
      kernel_sizes: per-scale K.
      ratios:       per-scale integer subsample ratios.
      k_up:         columns in up_idx (1 for the big path; 3 for the small
                    family's knn_interpolate decoders).
      dilations:    optional per-scale kNN dilation rates.
      method:       'random' (reference default) or 'fps'.
      rng:          numpy Generator for the subsampling choice.

    Returns:
      tuple of ScaleData (numpy arrays; wrap with jnp.asarray or feed
      through make_batch).
    """
    if rng is None:
        rng = np.random.default_rng()
    assert method in ("random", "fps")
    num_scales = len(kernel_sizes)
    dilations = dilations or [1] * num_scales
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    scales = []
    for s in range(num_scales):
        k, dil = kernel_sizes[s], dilations[s]
        neighbor_idx = knn_search(pos, pos, min(k * dil, pos.shape[1]))
        neighbor_idx = _dilate(neighbor_idx, k, dil, rng)
        sample_num = max(pos.shape[1] // ratios[s], 1)
        if method == "random":
            # one shared permutation across the batch, as the reference's
            # torch.randperm choice (datasets/s3dis_dataset.py:431-433)
            choice = rng.permutation(pos.shape[1])[:sample_num]
            sub_pos = pos[:, choice]
            sub_idx = neighbor_idx[:, choice]
        else:
            sub_pos = np.empty((pos.shape[0], sample_num, 3), np.float32)
            sub_idx = np.empty(
                (pos.shape[0], sample_num, neighbor_idx.shape[2]), np.int32
            )
            for b in range(pos.shape[0]):
                c = _fps_indices(pos[b], sample_num, rng)
                sub_pos[b] = pos[b, c]
                sub_idx[b] = neighbor_idx[b, c]
        up_idx = knn_search(sub_pos, pos, k_up)
        scales.append(
            ScaleData(
                pos=pos,
                neighbor_idx=neighbor_idx.astype(np.int32),
                sub_idx=sub_idx.astype(np.int32),
                up_idx=up_idx.astype(np.int32),
            )
        )
        pos = sub_pos
    return tuple(scales)


def build_pyramid_jax(
    pos: jnp.ndarray,
    kernel_sizes: Sequence[int] = BIG_KERNEL_SIZES,
    ratios: Sequence[int] = BIG_RATIOS,
    *,
    k_up: int = 1,
    key: Optional[jax.Array] = None,
) -> Tuple[ScaleData, ...]:
    """Jittable on-device pyramid builder (random subsampling only)."""
    from crfconv_tpu.ops.neighbors import knn_bruteforce

    if key is None:
        key = jax.random.PRNGKey(0)
    scales = []
    for s, (k, r) in enumerate(zip(kernel_sizes, ratios)):
        n = pos.shape[1]
        neighbor_idx = knn_bruteforce(pos, pos, min(k, n))
        sample_num = max(n // r, 1)
        key, sub = jax.random.split(key)
        choice = jax.random.permutation(sub, n)[:sample_num]
        sub_pos = pos[:, choice]
        sub_idx = neighbor_idx[:, choice]
        up_idx = knn_bruteforce(sub_pos, pos, k_up)
        scales.append(
            ScaleData(
                pos=pos, neighbor_idx=neighbor_idx,
                sub_idx=sub_idx, up_idx=up_idx,
            )
        )
        pos = sub_pos
    return tuple(scales)


def make_batch(
    x: np.ndarray,
    y: Optional[np.ndarray],
    scales: Tuple[ScaleData, ...],
    point_idx: Optional[np.ndarray] = None,
    cloud_idx: Optional[np.ndarray] = None,
    category: Optional[np.ndarray] = None,
    device_put: bool = True,
) -> PointBatch:
    """Assemble a PointBatch (optionally moving everything to device)."""
    batch = PointBatch(
        x=jnp.asarray(x, jnp.float32) if device_put else x,
        y=None if y is None else (jnp.asarray(y, jnp.int32) if device_put else y),
        scales=tuple(
            ScaleData(
                pos=jnp.asarray(s.pos) if device_put else s.pos,
                neighbor_idx=jnp.asarray(s.neighbor_idx) if device_put else s.neighbor_idx,
                sub_idx=None if s.sub_idx is None else (jnp.asarray(s.sub_idx) if device_put else s.sub_idx),
                up_idx=None if s.up_idx is None else (jnp.asarray(s.up_idx) if device_put else s.up_idx),
            )
            for s in scales
        ),
        point_idx=None if point_idx is None else (jnp.asarray(point_idx) if device_put else point_idx),
        cloud_idx=None if cloud_idx is None else (jnp.asarray(cloud_idx) if device_put else cloud_idx),
        category=None if category is None else (jnp.asarray(category) if device_put else category),
    )
    return batch


def synthetic_batch(
    batch_size: int = 2,
    num_points: int = 1024,
    in_channels: int = 6,
    n_classes: int = 13,
    kernel_sizes: Sequence[int] = BIG_KERNEL_SIZES,
    ratios: Sequence[int] = BIG_RATIOS,
    *,
    k_up: int = 1,
    seed: int = 0,
    with_category: bool = False,
) -> PointBatch:
    """Random point-cloud batch + pyramid, for tests and benchmarks."""
    rng = np.random.default_rng(seed)
    pos = rng.random((batch_size, num_points, 3), dtype=np.float32)
    feats = rng.random((batch_size, num_points, in_channels), dtype=np.float32)
    y = rng.integers(0, n_classes, size=(batch_size, num_points))
    scales = build_pyramid(
        pos, kernel_sizes, ratios, k_up=k_up, rng=rng
    )
    category = rng.integers(0, 16, size=(batch_size,)) if with_category else None
    return make_batch(feats, y, scales, category=category)
