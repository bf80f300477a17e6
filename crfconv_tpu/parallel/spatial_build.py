"""Point-sharded windowed pyramid construction.

Completes the end-to-end sharded serving path started by
``parallel/spatial_forward.py``: with this module, a Morton-sorted cloud
larger than one chip's HBM never needs to exist whole on any device —
``build_pyramid_windowed_spatial`` builds the SAME pyramid as
``ops.windowed.build_pyramid_windowed`` (bit-identical indices, same RNG
draws) inside one ``shard_map``:

  * same-scale window kNN: exchange one halo of positions, run the
    ordinary ``window_knn`` on the extended frame, keep the center rows,
    and globalize indices by the frame offset.  Edge devices overwrite
    their outer (ppermute zero-filled) halo rows with the builder's far
    sentinel so the true cloud boundary pads exactly as in the global
    computation.
  * stratified ¼-rate subsampling: the per-block random offsets are
    drawn OUTSIDE the shard_map with the exact key sequence of the
    unsharded builder (tiny replicated arrays), so both paths pick the
    same points; each device slices its local blocks.
  * the 1-NN up-link (bipartite fine→coarse kNN) halo-exchanges both
    frames; where the fine-frame halo exceeds a local span (deep
    scales), the op falls back to gathering its (tiny) operands whole.
  * scales below the sharding threshold are finished replicated from one
    all-gather of the (already small) cutover-scale positions.

The scale policy is ``spatial_forward.choose_sharded_scales`` — the
produced pyramid's placement is exactly what ``make_spatial_forward``
expects, so sharded serving = Morton sort → sharded build → sharded
forward with no fat all-gather anywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crfconv_tpu.data.batch import ScaleData
from crfconv_tpu.parallel.spatial import _exchange_halo
from crfconv_tpu.parallel.spatial_forward import (
    _all_gather_replicated,
    _halo_pair,
)

_SENTINEL = 2e9  # matches ops.windowed._pad_src's far-away source pad


def _mask_outer_halo(x_e, h: int, axis: str, ndev: int, value: float):
    """Replace the outer halo rows of edge devices (ppermute zero fill)
    with the global builder's pad value."""
    dev = jax.lax.axis_index(axis)
    rows = jnp.arange(x_e.shape[1])
    outer = ((dev == 0) & (rows < h)) | (
        (dev == ndev - 1) & (rows >= x_e.shape[1] - h)
    )
    return jnp.where(outer[None, :, None], value, x_e)


def _knn_local(
    pos_l, k, *, ns_g, axis, ndev, tile, pad, query_l=None, nt_g=None
):
    """window_knn on halo-extended local frames → LOCAL target rows with
    GLOBAL source indices (bit-equal to the unsharded window_knn)."""
    from crfconv_tpu.ops.windowed import window_knn

    if query_l is None:
        h_t = h_s = _halo_pair(ns_g, ns_g, tile, pad)[0]
        nt_g = ns_g
    else:
        h_t, h_s = _halo_pair(nt_g, ns_g, tile, pad)
    ls_local = ns_g // ndev
    lt_local = nt_g // ndev
    dev = jax.lax.axis_index(axis)

    if h_t > lt_local or h_s > ls_local:
        # deep-scale fallback: operands are tiny there — gather whole
        pos_f = _all_gather_replicated(pos_l, axis)
        q_f = (
            None
            if query_l is None
            else _all_gather_replicated(query_l, axis)
        )
        idx = window_knn(pos_f, k, query_pos=q_f, tile=tile, pad=pad)
        return jax.lax.dynamic_slice_in_dim(
            idx, dev * lt_local, lt_local, axis=1
        )

    pos_e = _mask_outer_halo(
        _exchange_halo(pos_l, h_s, axis), h_s, axis, ndev, _SENTINEL
    )
    q_e = (
        None
        if query_l is None
        else _mask_outer_halo(
            _exchange_halo(query_l, h_t, axis), h_t, axis, ndev, _SENTINEL
        )
    )
    idx_e = window_knn(pos_e, k, query_pos=q_e, tile=tile, pad=pad)
    idx = idx_e[:, h_t : h_t + lt_local]
    offset = dev * ls_local - h_s
    return jnp.clip(idx + offset, 0, ns_g - 1).astype(jnp.int32)


def build_pyramid_windowed_spatial(
    pos: jnp.ndarray,
    mesh: Mesh,
    kernel_sizes=(16, 16, 16, 16, 16),
    ratios=(4, 4, 4, 4, 2),
    *,
    k_up: int = 1,
    key: Optional[jax.Array] = None,
    axis: str = "data",
    tile: Optional[int] = None,
    pad: Optional[int] = None,
) -> Tuple[ScaleData, ...]:
    """Point-sharded twin of ``ops.windowed.build_pyramid_windowed``.

    ``pos`` must already be Morton-sorted ([B, N, 3]; apply
    ``ops.morton.morton_order`` host- or device-side first — unlike the
    unsharded builder, the global sort is the caller's step).  Returns
    the scales tuple, bit-identical to the unsharded builder under the
    same key; sharded scales come back placed P(None, axis), deep scales
    replicated."""
    from crfconv_tpu.ops.neighbors import get_neighbor_mode
    from crfconv_tpu.ops.windowed import window_knn
    from crfconv_tpu.parallel.spatial_forward import choose_sharded_scales

    mode = get_neighbor_mode()
    tile = mode["tile"] if tile is None else tile
    pad = mode["pad"] if pad is None else pad
    if key is None:
        key = jax.random.PRNGKey(0)
    ndev = mesh.shape[axis]
    n0 = pos.shape[1]

    # scale lengths + the exact RNG draw sequence of the unsharded builder
    lens, choices = [], []
    n = n0
    for r in ratios:
        lens.append(n)
        sample_num = max(n // r, 1)
        key, sub = jax.random.split(key)
        offsets = jax.random.randint(sub, (sample_num,), 0, r)
        choices.append(
            jnp.minimum(
                jnp.arange(sample_num) * r + offsets, n - 1
            ).astype(jnp.int32)
        )
        n = sample_num

    all_lens = set(lens) | {int(c.shape[0]) for c in choices}
    dummy = [np.zeros((1, m, 1), np.float32) for m in all_lens]
    sharded = choose_sharded_scales(dummy, ndev, tile, pad)
    # built top-down: a scale can only be sharded if its parent is (its
    # positions are sliced from the parent's local rows)
    for i, m in enumerate(lens):
        if m in sharded and i > 0 and lens[i - 1] not in sharded:
            sharded.discard(m)

    def local_build(pos_l, *choices_l):
        scales = []
        p = pos_l           # local while `cur` is sharded, else replicated
        cur = n0
        for s, (k, r) in enumerate(zip(kernel_sizes, ratios)):
            if cur not in sharded:
                break
            sample_num = int(choices[s].shape[0])
            loc_len = cur // ndev
            dev = jax.lax.axis_index(axis)
            nidx = _knn_local(
                p, min(k, cur), ns_g=cur, axis=axis, ndev=ndev,
                tile=tile, pad=pad,
            )
            if sample_num in sharded:
                ch_loc = (
                    jax.lax.dynamic_slice_in_dim(
                        choices_l[s], dev * (sample_num // ndev),
                        sample_num // ndev, axis=0,
                    )
                    - dev * loc_len
                )
                sub_pos = jnp.take(p, ch_loc, axis=1)
                sub_idx = jnp.take(nidx, ch_loc, axis=1)
                up = _knn_local(
                    sub_pos, k_up, ns_g=sample_num, nt_g=cur, axis=axis,
                    ndev=ndev, tile=tile, pad=pad, query_l=p,
                )
            else:
                # cutover: this (already small) scale is gathered once;
                # everything coarser is computed replicated
                p_full = _all_gather_replicated(p, axis)
                nidx_full = _all_gather_replicated(nidx, axis)
                sub_pos = jnp.take(p_full, choices_l[s], axis=1)
                sub_idx = jnp.take(nidx_full, choices_l[s], axis=1)
                up_full = window_knn(
                    sub_pos, k_up, query_pos=p_full, tile=tile, pad=pad
                )
                up = jax.lax.dynamic_slice_in_dim(
                    up_full, dev * loc_len, loc_len, axis=1
                )
            scales.append(
                ScaleData(
                    pos=p, neighbor_idx=nidx, sub_idx=sub_idx, up_idx=up
                )
            )
            p = sub_pos
            cur = sample_num

        # replicated tail: identical to the unsharded builder
        for s in range(len(scales), len(ratios)):
            k = min(kernel_sizes[s], cur)
            nidx = window_knn(p, k, tile=tile, pad=pad)
            sub_pos = jnp.take(p, choices_l[s], axis=1)
            sub_idx = jnp.take(nidx, choices_l[s], axis=1)
            up = window_knn(
                sub_pos, k_up, query_pos=p, tile=tile, pad=pad
            )
            scales.append(
                ScaleData(
                    pos=p, neighbor_idx=nidx, sub_idx=sub_idx, up_idx=up
                )
            )
            p = sub_pos
            cur = int(choices[s].shape[0])
        return tuple(scales)

    in_specs = (P(None, axis),) + (P(),) * len(choices)
    out_specs = []
    cur = n0
    for s in range(len(ratios)):
        sample_num = int(choices[s].shape[0])
        pos_spec = P(None, axis) if cur in sharded else P()
        sub_spec = P(None, axis) if sample_num in sharded else P()
        out_specs.append(
            ScaleData(
                pos=pos_spec, neighbor_idx=pos_spec,
                sub_idx=sub_spec, up_idx=pos_spec,
            )
        )
        cur = sample_num
    out_specs = tuple(out_specs)

    fn = jax.shard_map(
        local_build, mesh=mesh, in_specs=in_specs, out_specs=out_specs
    )
    pos = jax.device_put(pos, NamedSharding(mesh, P(None, axis)))
    choices = [
        jax.device_put(c, NamedSharding(mesh, P())) for c in choices
    ]
    return fn(pos, *choices)
