"""Halo-exchange spatial sharding for the FULL windowed forward.

``crf_mean_field_spatial`` (spatial.py) runs one op — the CRF decoder —
point-sharded with explicit halos.  This module generalizes the
mechanism to the whole flagship forward: ``make_spatial_forward`` wraps
an UNMODIFIED flax model in a ``shard_map`` over the point axis, and a
trace-time context (ops/spatial_state.py) reroutes every windowed
neighbor op to a halo-exchange implementation:

  * ``gather_neighbors`` (the single funnel for every point-axis gather:
    same-scale conv, strided conv, residual max-pool, 1-NN upsample, CRF
    guidance) becomes exchange → gather-on-extended-frame → trim.
  * ``crf_mean_field`` becomes the chunked halo iteration of
    crf_mean_field_spatial (same code path, reused).
  * the fused point-conv kernel runs per-device on the halo-extended
    frame (``spatial_point_conv_fused``) — exact by the affine window
    geometry, so the 3.2-4.2× single-chip kernel win carries over to
    the sharded forward (VERDICT r3 #3).

Correctness rests on the window geometry being affine
(ops/windowed.window_starts: starts[t] = round(t·tile·stride)//8·8 with
integer tile·stride for pyramid ratios {1,2,4,½,¼}), so extending BOTH
frames proportionally — source by h_s, target by h_t with
h_s = h_t·stride — translates every window start by exactly the frame
offset and the extended computation reproduces the global one for the
kept center rows.  The gather itself is an exact one-hot selection, so
sharded and unsharded forwards agree bit-for-bit.

Scale policy: a pyramid scale is sharded iff its per-device span is a
tile multiple and at least one same-scale halo (h = 512 rows at
t64-p128); coarser scales are replicated — they are vanishingly small
(at Semantic3D 8×65536 over 8 devices, scales 0-2 = 98.4% of all rows
are sharded).  Cross-scale ops where one side is replicated slice or
all-gather the SMALL side only; an infeasible halo (h_t exceeding the
local span, e.g. a 1-NN upsample from a tiny replicated scale) falls
back to gathering that op's operands whole — again only ever hit by
coarse scales.

This is the TPU answer to the reference's spatial block decomposition
(datasets/s3dis_dataset.py:146-169): instead of splitting clouds into
independent blocks and paying boundary artifacts, the full cloud stays
one connected network and devices exchange exact halos over ICI.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crfconv_tpu.ops import spatial_state


# ---------------------------------------------------------------------------
# halo geometry
# ---------------------------------------------------------------------------


def _halo_pair(nt_global: int, ns_global: int, tile: int, pad: int):
    """(h_t, h_s): target/source halo rows for a windowed gather whose
    global frames are (nt_global target rows, ns_global source rows).

    h_s ≥ width bounds every kept row's window inside the extended
    source; h_t is the smallest tile multiple with h_s = h_t·stride
    integral (stride·tile ∈ {16, 32, 64, 128, 256} for pyramid ratios)."""
    from crfconv_tpu.ops.windowed import window_starts

    _, width, _ = window_starts(nt_global, ns_global, tile, pad)
    stride = ns_global / nt_global
    h_t = int(math.ceil(width / (tile * stride))) * tile
    h_s = h_t * stride
    assert abs(h_s - round(h_s)) < 1e-9, (nt_global, ns_global, tile)
    return h_t, int(round(h_s))


def same_scale_halo(tile: int, pad: int) -> int:
    return _halo_pair(1024, 1024, tile, pad)[0]


def _all_gather_replicated(x, axis: str):
    """all_gather (tiled, axis 1) whose result is TYPED replicated (vma).

    ``jax.lax.all_gather`` keeps the device-varying type, which breaks
    out_specs replication checks and — worse — psum transposition in
    backward passes (the check_vma=False escape hatch silently
    mis-differentiates through psum).  Equivalent formulation: scatter
    the local shard into its global slot and psum — one collective,
    replicated-typed output, works for ints and floats, and the
    transpose (slice ∘ psum) routes cotangents exactly."""
    ndev = jax.lax.axis_size(axis)
    dev = jax.lax.axis_index(axis)
    n_local = x.shape[1]
    buf = jnp.zeros(
        x.shape[:1] + (n_local * ndev,) + x.shape[2:], x.dtype
    )
    buf = jax.lax.dynamic_update_slice_in_dim(buf, x, dev * n_local, axis=1)
    return jax.lax.psum(buf, axis)


# ---------------------------------------------------------------------------
# ctx-aware ops (called from the hooks in ops/neighbors.py, ops/crf.py)
# ---------------------------------------------------------------------------


def _frame(ctx, seen_len: int, what: str):
    fr = ctx["frames"].get(seen_len)
    if fr is None:
        raise KeyError(
            f"spatial forward: {what} has point-axis length {seen_len}, "
            f"which matches no pyramid frame {sorted(ctx['frames'])} — "
            "is the model using an op outside the windowed funnel?"
        )
    return fr


def spatial_gather(x, idx, tile: int, pad: int):
    """ctx-aware windowed gather: [B, Ls(_local), F] × [B, Lt(_local), K]
    → [B, Lt(_local), K, F], exact vs the unsharded gather."""
    from crfconv_tpu.ops.windowed import windowed_gather
    from crfconv_tpu.parallel.spatial import _exchange_halo

    ctx = spatial_state.current()
    assert ctx is not None
    ax, ndev = ctx["axis"], ctx["ndev"]
    src_sh, ns_g = _frame(ctx, x.shape[1], "gather source")
    tgt_sh, nt_g = _frame(ctx, idx.shape[1], "gather target")

    with spatial_state.suspend():
        if not tgt_sh:
            if src_sh:  # coarse replicated target from sharded fine source
                x = _all_gather_replicated(x, ax)
            return windowed_gather(x, idx, tile, pad)

        lt = idx.shape[1]
        h_t, h_s = _halo_pair(nt_g, ns_g, tile, pad)
        ls_local = ns_g // ndev
        feasible = (
            h_t <= lt
            and ns_g % ndev == 0
            and (not src_sh or h_s <= ls_local)
        )
        if not feasible:
            # whole-op fallback — only ever hit by tiny coarse scales
            # (e.g. 1-NN upsample out of a replicated deep scale)
            if src_sh:
                x = _all_gather_replicated(x, ax)
            idx_f = _all_gather_replicated(idx, ax)
            out = windowed_gather(x, idx_f, tile, pad)
            dev = jax.lax.axis_index(ax)
            return jax.lax.dynamic_slice_in_dim(out, dev * lt, lt, axis=1)

        if src_sh:
            x_e = _exchange_halo(x, h_s, ax)
        else:
            xp = jnp.pad(x, ((0, 0), (h_s, h_s)) + ((0, 0),) * (x.ndim - 2))
            dev = jax.lax.axis_index(ax)
            x_e = jax.lax.dynamic_slice_in_dim(
                xp, dev * ls_local, ls_local + 2 * h_s, axis=1
            )
        dev = jax.lax.axis_index(ax)
        offset = dev * ls_local - h_s
        idx_e = jnp.clip(
            _exchange_halo(idx, h_t, ax) - offset, 0, ls_local + 2 * h_s - 1
        ).astype(jnp.int32)
        out = windowed_gather(x_e, idx_e, tile, pad)
        return out[:, h_t:-h_t]


def spatial_point_conv_fused(
    x, pos, sub_pos, idx, extra, folded, tile: int, pad: int
):
    """Point-sharded fused point-conv: exchange → fused kernel on the
    extended frame → trim (VERDICT r3 #3; retires the start-shift note).

    The affine window geometry makes this exact with NO kernel change:
    extending both frames proportionally (source by h_s = h_t·stride)
    translates every window start by exactly the frame offset —
    ``window_starts(lt + 2h_t, ls + 2h_s)`` restricted to the kept
    center rows reproduces the global geometry, because tile·stride is
    a multiple of the 8-row alignment.  So the same Pallas kernel that
    wins 3.2-4.2× on one chip runs per-device under shard_map on the
    halo-extended arrays, and only the trimmed halo rows differ.

    Returns the conv output (and the strided residual rider) trimmed to
    local rows, or ``None`` when the halo is infeasible for this frame —
    the caller then falls back to the unfused spatial gather funnel.
    """
    from crfconv_tpu.ops import conv_pallas
    from crfconv_tpu.parallel.spatial import _exchange_halo

    ctx = spatial_state.current()
    assert ctx is not None
    ax, ndev = ctx["axis"], ctx["ndev"]
    src_sh, ns_g = _frame(ctx, x.shape[1], "fused conv source")
    tgt_sh, nt_g = _frame(ctx, idx.shape[1], "fused conv target")
    w0, a0, c0, w1, a1, c1 = folded

    def run(x_, pos_, sub_pos_, idx_, extra_):
        if extra_ is None:
            return conv_pallas.point_conv_fused_infer(
                x_, pos_, idx_, w0, a0, c0, w1, a1, c1,
                tile=tile, pad=pad, interpret=conv_pallas.FUSED_INTERPRET,
            )
        return conv_pallas.point_conv_fused_strided(
            x_, pos_, sub_pos_, idx_, extra_, w0, a0, c0, w1, a1, c1,
            tile=tile, pad=pad, interpret=conv_pallas.FUSED_INTERPRET,
        )

    with spatial_state.suspend():
        if not tgt_sh:
            if src_sh:  # replicated target from sharded source
                x = _all_gather_replicated(x, ax)
                pos = _all_gather_replicated(pos, ax)
                if extra is not None:
                    extra = _all_gather_replicated(extra, ax)
            return run(x, pos, sub_pos, idx, extra)

        lt = idx.shape[1]
        h_t, h_s = _halo_pair(nt_g, ns_g, tile, pad)
        ls_local = ns_g // ndev
        feasible = (
            h_t <= lt
            and ns_g % ndev == 0
            and (not src_sh or h_s <= ls_local)
        )
        if not feasible:
            return None  # unfused funnel handles the whole-op fallback

        dev = jax.lax.axis_index(ax)
        if src_sh:
            ex_s = lambda a: _exchange_halo(a, h_s, ax)
        else:
            def ex_s(a):
                ap = jnp.pad(
                    a, ((0, 0), (h_s, h_s)) + ((0, 0),) * (a.ndim - 2)
                )
                return jax.lax.dynamic_slice_in_dim(
                    ap, dev * ls_local, ls_local + 2 * h_s, axis=1
                )

        x_e, pos_e = ex_s(x), ex_s(pos)
        extra_e = None if extra is None else ex_s(extra)
        offset = dev * ls_local - h_s
        idx_e = jnp.clip(
            _exchange_halo(idx, h_t, ax) - offset, 0, ls_local + 2 * h_s - 1
        ).astype(jnp.int32)
        sub_pos_e = (
            None if sub_pos is None else _exchange_halo(sub_pos, h_t, ax)
        )
        out = run(x_e, pos_e, sub_pos_e, idx_e, extra_e)
        if extra is None:
            return out[:, h_t:-h_t]
        o, r = out
        return o[:, h_t:-h_t], r[:, h_t:-h_t]


def spatial_crf_similarity(y, z, idx, tile: int, pad: int):
    """Point-sharded fused CRF similarity (+ first message): exchange →
    crf_sim_pallas kernel on the extended frame → trim.  Same-scale
    geometry (similarity indices always reference their own scale), so
    h_t == h_s.  Returns (msg, s) in local rows, or None when the halo
    is infeasible (caller falls back to the spatial gather funnel).
    The msg is exact but unused by the chunked halo CRF iteration —
    the payoff here is computing s without the [B, N, K, 2H] spatial
    gather."""
    from crfconv_tpu.ops import crf_sim_pallas
    from crfconv_tpu.parallel.spatial import _exchange_halo

    ctx = spatial_state.current()
    assert ctx is not None
    ax, ndev = ctx["axis"], ctx["ndev"]
    sh, n_g = _frame(ctx, y.shape[1], "CRF similarity")

    with spatial_state.suspend():
        if not sh:
            msg, s = crf_sim_pallas.crf_similarity_message(
                y, z, idx, tile=tile, pad=pad,
                interpret=crf_sim_pallas.SIM_INTERPRET,
            )
            return msg, s
        local = y.shape[1]
        h, h_s = _halo_pair(n_g, n_g, tile, pad)
        assert h == h_s
        if h > local or n_g % ndev != 0:
            return None
        dev = jax.lax.axis_index(ax)
        offset = dev * local - h
        y_e = _exchange_halo(y, h, ax)
        z_e = _exchange_halo(z, h, ax)
        idx_e = jnp.clip(
            _exchange_halo(idx, h, ax) - offset, 0, local + 2 * h - 1
        ).astype(jnp.int32)
        msg, s = crf_sim_pallas.crf_similarity_message(
            y_e, z_e, idx_e, tile=tile, pad=pad,
            interpret=crf_sim_pallas.SIM_INTERPRET,
        )
        return msg[:, h:-h], s[:, h:-h]


def crf_mean_field_ctx(z, s, neighbor_idx, c, steps, neighbors0, allow_fused):
    """ctx-aware continuous CRF mean field (hooked from ops.crf)."""
    from crfconv_tpu.ops.crf import crf_mean_field
    from crfconv_tpu.ops.neighbors import get_neighbor_mode
    from crfconv_tpu.parallel.spatial import _crf_local_chunks, _halo_rows

    ctx = spatial_state.current()
    assert ctx is not None
    sharded, n_g = _frame(ctx, z.shape[1], "CRF state")
    if not sharded:
        with spatial_state.suspend():
            return crf_mean_field(
                z, s, neighbor_idx, c, steps=steps, neighbors0=neighbors0,
                allow_fused=allow_fused,
            )
    mode = get_neighbor_mode()
    tile, pad = mode["tile"], mode["pad"]
    local = z.shape[1]
    j = steps
    while j > 1 and 2 * _halo_rows(j, tile, pad) >= local:
        j -= 1
    h = _halo_rows(j, tile, pad)
    assert h <= local, (
        f"spatial CRF halo {h} exceeds the local span {local}; this scale "
        "should have been replicated by the make_spatial_forward policy"
    )
    # neighbors0 is a LOCAL pre-gather; the chunked iteration re-gathers
    # on the extended frame, so it is simply dropped here.
    return _crf_local_chunks(
        z, s, neighbor_idx, c, steps=steps, j=j, h=h, local=local,
        axis=ctx["axis"], allow_fused=allow_fused,
    )


# ---------------------------------------------------------------------------
# the public API
# ---------------------------------------------------------------------------


def _point_axis_lengths(batch) -> set:
    return {
        leaf.shape[1]
        for leaf in jax.tree_util.tree_leaves(batch)
        if hasattr(leaf, "ndim") and leaf.ndim >= 2
    }


def choose_sharded_scales(batch, ndev: int, tile: int, pad: int):
    """Largest prefix of pyramid scales (by descending length) that can be
    sharded: per-device span a tile multiple, at least one same-scale
    halo, and no seen-length collision between a sharded scale's local
    span and another frame's span (the frame table is keyed by the
    length ops observe inside shard_map)."""
    lens = sorted(_point_axis_lengths(batch), reverse=True)
    h_same = same_scale_halo(tile, pad)

    def eligible(n):
        return n % ndev == 0 and (n // ndev) % tile == 0 and (
            n // ndev >= h_same
        )

    for cut in range(len(lens), -1, -1):
        sharded = set(lens[:cut])
        if not all(eligible(n) for n in sharded):
            continue
        keys = [n // ndev for n in sharded] + [
            n for n in lens if n not in sharded
        ]
        if len(keys) == len(set(keys)):
            return sharded
    return set()


def make_spatial_forward(
    model,
    mesh: Mesh,
    example_batch,
    axis: str = "data",
    tile: Optional[int] = None,
    pad: Optional[int] = None,
    check_vma: bool = True,
):
    """Build a jitted, point-sharded eval forward for an unmodified model.

    ``check_vma=False`` disables shard_map's varying-manual-axes type
    checking.  ONLY safe here because this is a pure eval forward (no
    AD — the known check_vma=False hazard is silent psum
    mis-differentiation, see parallel/spatial_train.py); needed for
    interpret-mode Pallas kernels on the CPU test mesh, whose
    interpreter mixes unvarying loop counters into the kernel jaxpr.

    Returns ``(fn, info)``: ``fn(variables, batch) -> logits`` runs
    ``model.apply(variables, batch, train=False)`` inside a shard_map
    over ``mesh[axis]`` with every windowed op halo-exchanged;  ``info``
    records which pyramid scales were sharded.  Requires the windowed
    neighbor regime.  The returned fn is traced once per shape (reuse it
    across batches — it is the serving entry point)."""
    from crfconv_tpu.ops.neighbors import get_neighbor_mode

    mode = get_neighbor_mode()
    assert mode["mode"] == "windowed", (
        "spatial forward requires the windowed neighbor regime"
    )
    tile = mode["tile"] if tile is None else tile
    pad = mode["pad"] if pad is None else pad
    ndev = mesh.shape[axis]

    sharded = choose_sharded_scales(example_batch, ndev, tile, pad)
    frames = {}
    for n in _point_axis_lengths(example_batch):
        if n in sharded:
            frames[n // ndev] = (True, n)
        else:
            frames[n] = (False, n)
    ctx = {"axis": axis, "ndev": ndev, "frames": frames}

    def spec_of(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 and (
            leaf.shape[1] in sharded
        ):
            return P(None, axis)
        return P()

    batch_specs = jax.tree_util.tree_map(spec_of, example_batch)
    n0 = example_batch.x.shape[1]
    out_spec = P(None, axis) if n0 in sharded else P()

    def local_forward(variables, lbatch):
        with spatial_state.activate(ctx):
            return model.apply(variables, lbatch, train=False)

    mapped = jax.shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=out_spec,
        check_vma=check_vma,
    )
    fn = jax.jit(mapped)

    def run(variables, batch):
        batch = jax.tree_util.tree_map(
            lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
            batch, batch_specs,
        )
        return fn(variables, batch)

    run.jitted = fn  # for lowering/compiled-artifact inspection

    info = {
        "sharded_scales": sorted(sharded, reverse=True),
        "replicated_scales": sorted(
            _point_axis_lengths(example_batch) - sharded, reverse=True
        ),
        "same_scale_halo": same_scale_halo(tile, pad),
    }
    return run, info


def forward_spatial(model, variables, batch, mesh: Mesh, axis: str = "data"):
    """One-shot convenience wrapper around :func:`make_spatial_forward`."""
    fn, _ = make_spatial_forward(model, mesh, batch, axis=axis)
    return fn(variables, batch)
