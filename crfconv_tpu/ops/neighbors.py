"""Dense neighbor-index primitives.

All graph structure in this framework is a padded int32 index tensor, so
every op here is a static-shape gather / reduction that XLA can tile for
the TPU.  These replace the reference's torch.gather helpers
(models/point_conv_big.py:25-35, models/continuous_crf_conv_big.py:38-47)
and its dynamic torch_geometric/torch_scatter graph ops
(models/point_conv.py:140-195) — the latter by construction: indices are
precomputed host-side, never on the device hot path.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

# Gather regime: 'exact' uses XLA's index-serial gather (bit-exact,
# default); 'windowed' requires a Morton-sorted, window-consistent index
# pyramid (ops/windowed.py) and turns every gather into per-tile one-hot
# matmuls on the MXU.  The switch is read at TRACE time — set it before
# jitting the model.
_MODE = {"mode": "exact", "tile": 64, "pad": 128, "knn_exact": True}


def set_neighbor_mode(
    mode: str, tile: int = 64, pad: int = 128, knn_exact: bool = True
) -> None:
    """Configure the gather regime.

    knn_exact selects the window-kNN selection variant: True is
    bit-identical to lax.top_k (lowest-index tie-break); False uses the
    ~2× faster packed-key selection whose tie radius widens to 2⁻¹³
    relative distance (immaterial for neighborhood construction — see
    benchmarks/windowed_accuracy.py)."""
    assert mode in ("exact", "windowed")
    _MODE.update(mode=mode, tile=tile, pad=pad, knn_exact=knn_exact)


def get_neighbor_mode() -> dict:
    return dict(_MODE)


@contextlib.contextmanager
def neighbor_mode(
    mode: str, tile: int = 64, pad: int = 128, knn_exact: bool = True
):
    prev = get_neighbor_mode()
    set_neighbor_mode(mode, tile, pad, knn_exact)
    try:
        yield
    finally:
        _MODE.update(prev)


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point neighbor features.

    Args:
      x:   [B, N, F] point features.
      idx: [B, M, K] int32 indices into the N axis.

    Returns:
      [B, M, K, F] neighbor features.
    """
    if _MODE["mode"] == "windowed":
        from crfconv_tpu.ops import spatial_state

        if spatial_state.current() is not None:
            # point-sharded forward (parallel/spatial_forward.py): the
            # gather runs halo-exchanged on this device's local span
            from crfconv_tpu.parallel.spatial_forward import spatial_gather

            return spatial_gather(x, idx, _MODE["tile"], _MODE["pad"])
        from crfconv_tpu.ops.windowed import windowed_gather

        return windowed_gather(x, idx, _MODE["tile"], _MODE["pad"])
    B, M, K = idx.shape
    F = x.shape[-1]
    flat = jnp.take_along_axis(
        x, idx.reshape(B, M * K, 1), axis=1, mode="promise_in_bounds"
    )
    return flat.reshape(B, M, K, F)


def upsample_nearest(x: jnp.ndarray, up_idx: jnp.ndarray) -> jnp.ndarray:
    """1-NN upsample: copy each coarse feature to its fine-scale points.

    Args:
      x:      [B, S, F] coarse features.
      up_idx: [B, N, 1] int32 index of the nearest coarse point.

    Returns:
      [B, N, F].
    """
    if _MODE["mode"] == "windowed":
        return gather_neighbors(x, up_idx)[:, :, 0]
    return jnp.take_along_axis(x, up_idx, axis=1, mode="promise_in_bounds")


def max_pool_neighbors(
    x: jnp.ndarray, idx: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Strided max-pool: max over the K neighbors of each output point.

    Mirrors the reference's strided-residual pooling
    (models/point_conv_big.py:74-77).

    Args:
      x:    [B, N, F] fine-scale features.
      idx:  [B, S, K] neighbor indices into N for each coarse point.
      mask: optional [B, S, K] bool validity of each neighbor slot.

    Returns:
      [B, S, F].
    """
    n = gather_neighbors(x, idx)  # [B, S, K, F]
    if mask is not None:
        neg = jnp.finfo(x.dtype).min
        n = jnp.where(mask[..., None], n, neg)
    return jnp.max(n, axis=2)


def masked_softmax(
    logits: jnp.ndarray, mask: Optional[jnp.ndarray] = None, axis: int = -1
) -> jnp.ndarray:
    """Numerically safe softmax with an optional validity mask.

    Masked slots get probability exactly 0; if an entire row is masked
    the result is all zeros (not NaN), which composes safely with
    downstream weighted sums.
    """
    if mask is None:
        return jax.nn.softmax(logits, axis=axis)
    neg = jnp.finfo(logits.dtype).min
    z = jnp.where(mask, logits, neg)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=axis, keepdims=True))
    e = jnp.where(mask, jnp.exp(z), 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, jnp.finfo(logits.dtype).tiny)


def remove_self_loop(neighbor_idx: jnp.ndarray) -> jnp.ndarray:
    """Drop neighbor column 0 (the query point itself).

    The host pipeline emits self-inclusive kNN (column 0 = self, as the
    reference's nanoflann kNN does); the CRF excludes the self edge
    (reference: models/continuous_crf_conv_big.py:45-47).
    """
    return neighbor_idx[:, :, 1:]


def knn_interpolate(
    x: jnp.ndarray,
    pos_src: jnp.ndarray,
    pos_dst: jnp.ndarray,
    up_idx: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Inverse-distance-weighted k-NN interpolation (coarse → fine).

    Dense counterpart of torch_geometric's ``knn_interpolate`` (used by the
    reference decoders, models/point_conv.py:267-280): each fine point gets
    the 1/d²-weighted average of its k nearest coarse points.

    Args:
      x:       [B, S, F] coarse features.
      pos_src: [B, S, 3] coarse positions.
      pos_dst: [B, N, 3] fine positions.
      up_idx:  [B, N, k] indices of the k nearest coarse points.

    Returns:
      [B, N, F].
    """
    nx = gather_neighbors(x, up_idx)                    # [B, N, k, F]
    npos = gather_neighbors(pos_src, up_idx)            # [B, N, k, 3]
    d2 = jnp.sum(jnp.square(pos_dst[:, :, None, :] - npos), axis=-1)
    w = 1.0 / jnp.maximum(d2, eps)                      # [B, N, k]
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.einsum("bnk,bnkf->bnf", w, nx)


def knn_bruteforce(
    support: jnp.ndarray,
    query: jnp.ndarray,
    k: int,
    *,
    tile: Optional[int] = None,
    exact: bool = True,
    recall_target: float = 0.99,
) -> jnp.ndarray:
    """Batched kNN on device via tiled brute force.

    The TPU-resident counterpart to the host C++ KD-tree search: distance
    blocks are MXU matmuls, computed tile-by-tile over the query axis so
    only one [tile, N] block is live at a time (the tile auto-sizes to a
    ~128 MB budget, so Semantic3D-scale clouds of 65k+ points fit).  With
    ``exact=False`` the top-k uses the TPU-optimized ``approx_max_k``
    (MIPS-style, recall ≥ recall_target) — much faster at large N and
    statistically indistinguishable for neighborhood construction.

    Args:
      support: [B, N, 3] points searched over.
      query:   [B, M, 3] query points.
      k:       neighbor count (k ≤ N).

    Returns:
      [B, M, k] int32 indices, ascending distance (exact mode breaks ties
      by index, so column 0 is the query point itself when query==support).
    """
    B, N, _ = support.shape
    M = query.shape[1]
    if tile is None:
        budget = 128 * 1024 * 1024 // 4  # f32 elements per live block
        tile = max(min(budget // max(N, 1), M, 4096), 8)
    tile = min(tile, M)
    pad = (-M) % tile
    q = jnp.pad(query, ((0, 0), (0, pad), (0, 0)))
    nt = q.shape[1] // tile
    q = q.reshape(B * nt, tile, 3)
    s_sq = jnp.sum(support * support, axis=-1)  # [B, N]

    def per_tile(args):
        qt, sup, ssq = args  # [tile,3], [N,3], [N]
        # The cross term must run at full f32: the platform-default bf16
        # MXU pass perturbs the self-distance away from 0 and breaks the
        # col-0 == self invariant.
        cross = jnp.dot(qt, sup.T, precision=jax.lax.Precision.HIGHEST)
        d = jnp.sum(qt * qt, axis=-1, keepdims=True) - 2.0 * cross + ssq[None, :]
        if exact:
            _, idx = jax.lax.top_k(-d, k)
        else:
            _, idx = jax.lax.approx_max_k(
                -d, k, recall_target=recall_target
            )
        return idx.astype(jnp.int32)

    # sequential map over (batch × tile) keeps exactly one distance block
    # in HBM at a time; XLA double-buffers across iterations.
    sup_rep = jnp.repeat(
        jnp.arange(B, dtype=jnp.int32), nt
    )  # block -> batch index
    idx = jax.lax.map(
        lambda i: per_tile((q[i], support[sup_rep[i]], s_sq[sup_rep[i]])),
        jnp.arange(B * nt, dtype=jnp.int32),
    )  # [B*nt, tile, k]
    idx = idx.reshape(B, nt * tile, k)[:, :M]
    return idx
