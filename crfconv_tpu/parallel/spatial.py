"""Halo-exchange spatial sharding for the windowed CRF decoder.

``shard_points`` (sharding.py) lets GSPMD partition a whole jitted step
over the point axis, but Pallas calls have no SPMD partitioning rule, so
XLA all-gathers their operands — per-device memory does not drop for the
kernels that matter.  This module is the explicit-communication path: a
``shard_map`` over the point axis that runs the SAME fused CRF kernel on
each device's local span, made correct by halo-and-trim:

  * Each device holds a contiguous span of L = N/D Morton-sorted rows.
  * One mean-field step reads neighbors only inside a point's candidate
    window (reach ≤ ``width`` rows either way, ops/windowed.window_starts),
    so J steps have a dependency cone of J·width rows.
  * Before a chunk of J steps, each device fetches H = J·width (rounded
    to the 128-row kernel tile) rows of state from both neighbors via
    ``jax.lax.ppermute`` over ICI, runs the chunk on the extended block
    [H | L | H], and keeps the center L rows — which are exactly the
    rows whose cones stayed inside the block.

  Correctness at the seams needs no masking: same-scale window geometry
  is translation invariant in steps of ``tile`` (starts[t] = t·tile for
  stride 1), so rebasing global neighbor indices by ``offset − H`` keeps
  every index window-consistent on the extended block, and the
  dependency cone of a kept row never reaches the (garbage) outermost
  halo rows — global indices clamp at the cloud boundary, so the graph
  itself never points outside [0, N).

This is the TPU analog of the reference's spatial block decomposition
(datasets/s3dis_dataset.py:146-169): the reference splits clouds into
independent 1-2 m blocks and pays boundary artifacts; here the full
cloud stays one connected CRF system and devices exchange exact halos.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _halo_rows(steps: int, tile: int, pad: int) -> int:
    """Dependency-cone halo for ``steps`` mean-field steps, rounded up to
    the fused kernel's 128-row tile so the extended block keeps kernel
    alignment."""
    from crfconv_tpu.ops.windowed import window_starts

    _, width, _ = window_starts(128, 128, tile, pad)  # width is n-independent
    return -(-(steps * width) // 128) * 128


def _exchange_halo(x: jnp.ndarray, h: int, axis: str) -> jnp.ndarray:
    """[B, L, ...] local block -> [B, H+L+H, ...] with neighbor halos.

    Left halo = previous device's last H rows, right halo = next device's
    first H rows; edge devices receive ppermute's zero fill (their halo
    rows are unreferenced by construction — global indices never point
    past the cloud boundary)."""
    d = jax.lax.axis_size(axis)
    if d == 1:
        zero = jnp.zeros_like(x[:, :h])
        return jnp.concatenate([zero, x, zero], axis=1)
    fwd = [(i, i + 1) for i in range(d - 1)]       # to the right neighbor
    bwd = [(i + 1, i) for i in range(d - 1)]       # to the left neighbor
    left = jax.lax.ppermute(x[:, -h:], axis, fwd)  # from device i-1
    right = jax.lax.ppermute(x[:, :h], axis, bwd)  # from device i+1
    return jnp.concatenate([left, x, right], axis=1)


def _crf_local_chunks(
    z_l, s_l, idx_l, c_r, *, steps, j, h, local, axis, allow_fused
):
    """Per-device chunked CRF mean field on a halo-extended block.

    Runs INSIDE shard_map (used by crf_mean_field_spatial and the
    full-forward spatial context, parallel/spatial_forward.py): exchange
    H = J·width rows of state, run J steps on [H | L | H], keep the
    center L rows, repeat.  The spatial-forward context is suspended
    around the inner call so the shared jitted CRF kernels are always
    traced context-free (ops/spatial_state.py documents why)."""
    from crfconv_tpu.ops import spatial_state
    from crfconv_tpu.ops.crf import crf_mean_field

    dev = jax.lax.axis_index(axis)
    offset = dev * local - h                 # ext row 0 in global coords
    z_e = _exchange_halo(z_l, h, axis)
    s_e = _exchange_halo(s_l, h, axis)
    idx_e = jnp.clip(
        _exchange_halo(idx_l, h, axis) - offset, 0, local + 2 * h - 1
    ).astype(jnp.int32)

    x_e = z_e
    done = 0
    with spatial_state.suspend():
        while done < steps:
            take = min(j, steps - done)
            if done > 0:
                x_e = _exchange_halo(x_e[:, h:-h], h, axis)
            # the fused kernel treats z as the initial state AND the
            # per-step unary; feed the chunk the true unary z_e but start
            # from the current state by running the chunk's recurrence
            # x <- (z + (S x) C) M with x0 = current x_e
            x_e = crf_mean_field(
                z_e, s_e, idx_e, c_r, steps=take,
                allow_fused=allow_fused, x0=x_e if done else None,
            )
            done += take
    return x_e[:, h:-h]


def _discrete_local_chunks(
    p_l, u_l, w_l, idx_l, compat, *, steps, j, h, local, axis, allow_fused
):
    """Chunked halo iteration for the DISCRETE CRF (CRF-as-RNN) — same
    dependency-cone structure as the continuous `_crf_local_chunks`
    (q ← softmax(−u − (Σ w q) C): one step reaches one window width)."""
    from crfconv_tpu.ops import spatial_state
    from crfconv_tpu.ops.crf import discrete_crf_update

    dev = jax.lax.axis_index(axis)
    offset = dev * local - h
    u_e = _exchange_halo(u_l, h, axis)
    w_e = _exchange_halo(w_l, h, axis)
    idx_e = jnp.clip(
        _exchange_halo(idx_l, h, axis) - offset, 0, local + 2 * h - 1
    ).astype(jnp.int32)

    q_e = _exchange_halo(p_l, h, axis)
    done = 0
    with spatial_state.suspend():
        while done < steps:
            take = min(j, steps - done)
            if done > 0:
                q_e = _exchange_halo(q_e[:, h:-h], h, axis)
            q_e = discrete_crf_update(
                q_e, u_e, w_e, idx_e, compat, steps=take,
                allow_fused=allow_fused,
            )
            done += take
    return q_e[:, h:-h]


def crf_mean_field_spatial(
    z: jnp.ndarray,
    s: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    c: jnp.ndarray,
    mesh: Mesh,
    steps: int = 1,
    axis: str = "data",
    halo_steps: Optional[int] = None,
    allow_fused: bool = True,
):
    """Point-axis-sharded continuous CRF mean field (same math/contract
    as ops.crf.crf_mean_field, which documents the arguments).

    z, s, neighbor_idx are [B, N, ...] global arrays (any current
    placement); the result is sharded P(None, axis) over the mesh.

    ``halo_steps`` chunks the iteration: halos are exchanged every J
    steps with H = J·width rows, trading ICI messages for redundant
    boundary compute.  Default: one chunk (J = steps) when 2H < L,
    otherwise the largest J that fits — steps=1-3 decoders exchange
    once; deep (steps=10) CRFs on tight spans exchange in chunks.
    """
    from crfconv_tpu.ops.neighbors import get_neighbor_mode

    mode = get_neighbor_mode()
    tile, pad = mode["tile"], mode["pad"]
    d = mesh.shape[axis]
    n = z.shape[1]
    assert n % d == 0, f"point count {n} not divisible by mesh size {d}"
    local = n // d
    assert local % tile == 0, (
        f"local span {local} must be a multiple of tile {tile} to keep "
        "window geometry translation-consistent"
    )

    j = halo_steps if halo_steps is not None else steps
    while j > 1 and 2 * _halo_rows(j, tile, pad) >= local:
        j -= 1
    h = _halo_rows(j, tile, pad)
    assert 2 * h < local, (
        f"halo {h} rows x2 exceeds local span {local}; use more points "
        "per device or fewer halo_steps"
    )

    local_fn = partial(
        _crf_local_chunks, steps=steps, j=j, h=h, local=local, axis=axis,
        allow_fused=allow_fused,
    )

    spec_n = P(None, axis)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec_n, spec_n, spec_n, P()),
        out_specs=spec_n,
    )
    sharding = NamedSharding(mesh, spec_n)
    z = jax.device_put(z, sharding)
    s = jax.device_put(s, sharding)
    neighbor_idx = jax.device_put(neighbor_idx, sharding)
    c = jax.device_put(c, NamedSharding(mesh, P()))
    return fn(z, s, neighbor_idx, c)
