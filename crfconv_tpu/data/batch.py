"""Static-shape batch containers for the multiscale point pyramid.

The reference framework feeds its dense ("big") models a MultiScaleData
batch: features ``x [B, N, C]``, labels ``y [B, N]`` and a list of
per-scale ``Data(pos, neighbor_idx, sub_idx, up_idx)`` records built at
collate time (reference: datasets/s3dis_dataset.py:416-449, consumed at
models/point_conv_big.py:142-163).  Here the same protocol becomes a pair
of NamedTuple pytrees so the whole batch is jittable, shardable with
jax.sharding, and has a fully static shape.

Index semantics (all int32, all padded to fixed K):
  * ``neighbor_idx [B, N_s, K]``  — kNN of each scale-s point within
    scale s.  Column 0 is the point itself (self-loop), matching the
    reference kNN convention; the CRF drops it.
  * ``sub_idx      [B, N_{s+1}, K]`` — for each scale-(s+1) point, the
    indices (into scale s) of its K neighbors; used for strided convs
    and pooling.
  * ``up_idx       [B, N_s, 1]``  — for each scale-s point, its single
    nearest scale-(s+1) point; used by decoder upsampling.
  * ``pos          [B, N_s, 3]``  — point positions at scale s.

Padding: clouds shorter than N are padded by duplicating valid points
(the reference uses torch_geometric FixedPoints the same way,
datasets/s3dis_dataset.py:376-377), so no validity mask is required on
the feature path; the loss/metrics mask via ``ignore_index`` labels.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp


class ScaleData(NamedTuple):
    """Per-scale slice of the precomputed multiscale pyramid."""

    pos: jnp.ndarray            # [B, N_s, 3] float
    neighbor_idx: jnp.ndarray   # [B, N_s, K] int32 (self-inclusive kNN)
    sub_idx: Optional[jnp.ndarray] = None  # [B, N_{s+1}, K] int32
    up_idx: Optional[jnp.ndarray] = None   # [B, N_s, 1] int32


class RawBatch(NamedTuple):
    """A batch before neighbor-structure construction — used by the
    windowed regime, where the pyramid is built on-device inside the
    jitted step (ops/windowed.py::build_pyramid_windowed)."""

    pos: jnp.ndarray                    # [B, N, 3]
    x: jnp.ndarray                      # [B, N, C_in]
    y: Optional[jnp.ndarray] = None     # [B, N]
    point_idx: Optional[jnp.ndarray] = None
    cloud_idx: Optional[jnp.ndarray] = None
    category: Optional[jnp.ndarray] = None


class PointBatch(NamedTuple):
    """A dense batch of fixed-size point clouds plus its index pyramid."""

    x: jnp.ndarray                      # [B, N, C_in] float features
    y: Optional[jnp.ndarray]            # [B, N] int labels (may be None at pure inference)
    scales: Tuple[ScaleData, ...]       # length = num_scales
    point_idx: Optional[jnp.ndarray] = None  # [B, N] int32 original-cloud point ids
    cloud_idx: Optional[jnp.ndarray] = None  # [B] int32 cloud ids
    category: Optional[jnp.ndarray] = None   # [B] int32 (ShapeNet part-seg object class)

    @property
    def batch_size(self) -> int:
        return self.x.shape[0]

    @property
    def num_points(self) -> int:
        return self.x.shape[1]
