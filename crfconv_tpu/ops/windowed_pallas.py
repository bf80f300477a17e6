"""Pallas kernel for the windowed neighbor gather.

Per (batch, tile) grid cell: DMA the tile's candidate window from HBM
into VMEM, build one-hot selection matrices on the fly in VMEM (the XLA
fallback materializes ~1 GB of one-hots per layer in HBM), and select
rows with K small MXU matmuls.  Values are kept at ~f32 fidelity by a
hi/lo bf16 split of the window (the one-hot operand is exactly
representable, so two bf16 passes reconstruct the source to ~2⁻¹⁶
relative error).

Two kernel bodies, dispatched on gather size (both measured on v5e,
benchmarks/gather_kernel_bench.py):

* LARGE (M ≥ 4096): ``rel`` rides pre-shaped as [B, nt, K, tile, 1] so
  each k's indices are already a sublane column (the compact [tile, K]
  layout costs a lane→sublane relayout per k), and the window DMA is
  double-buffered ACROSS grid cells (scratch persists over the
  sequential grid).  1.2-1.4× over the r1 kernel at the scale-0 shapes.
* SMALL: the column layout's 128-lane padding of the trailing singleton
  (~1 MB/cell of rel DMA) dominates small cells, so small gathers keep
  the compact layout + single-buffered DMA, which measures ~2× faster
  there.

The output is [B, nt·tile, K·F] with per-k lane-slice writes — the
assembly order that needs no relayout in-kernel and no transpose
outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crfconv_tpu.ops.pallas_vma import pallas_call as vma_pallas_call

LARGE_M = 4096   # output-row threshold between the two kernel bodies
V3_MAX_F = 0     # widest F routed to the v3 lane-gather body.  Stays 0:
                 # the r3 hardware A/B (results_gather_bodies_r3.json)
                 # measured v3 SLOWER than v1 at every model shape
                 # (e.g. sem3d-scale0-conv 22.1 vs 16.7 ms) — like v2
                 # and supertiling, a documented negative result; the
                 # kernel is MXU/DMA-bound, not lane-gather-bound.


def _kernel_large(
    starts_ref, rel_ref, xp_ref, out_ref, win_ref, sem,
    *, width, tile, k_cols, feat, f_pad, nt, nb,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    g = b * nt + t
    total = nb * nt

    def win_dma(cell, slot):
        bb = cell // nt
        tt = jax.lax.rem(cell, nt)
        s = pl.multiple_of(starts_ref[tt], 8)
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(s, width), :], win_ref.at[slot], sem.at[slot]
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        win_dma(g + 1, jax.lax.rem(g + 1, 2)).start()

    win_dma(g, slot).wait()
    win = win_ref[slot]
    hi = win.astype(jnp.bfloat16)
    lo = (win - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    rel = rel_ref[0, 0]                      # [K, tile, 1] int32
    # group k-columns so each matmul fills >=128 MXU rows (tile may be 64)
    grp = max(128 // tile, 1)
    for k0 in range(0, k_cols, grp):
        gn = min(grp, k_cols - k0)
        relg = jnp.concatenate(
            [rel[k0 + j] for j in range(gn)], axis=0
        )                                                  # [gn*tile, 1]
        iota_g = jax.lax.broadcasted_iota(
            jnp.int32, (gn * tile, width), 1
        )
        oh = (relg == iota_g).astype(jnp.bfloat16)        # [gn*tile, width]
        out = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
        out += jnp.dot(oh, lo, preferred_element_type=jnp.float32)
        for j in range(gn):
            k = k0 + j
            out_ref[0, :, k * feat : (k + 1) * feat] = out[
                j * tile : (j + 1) * tile, :feat
            ].astype(out_ref.dtype)


def _kernel_large2(
    starts_ref, rel_ref, xp_ref, out_ref, win_ref, sem,
    *, width2, tile, k_cols, feat, f_pad, nt, nb, p, npairs,
):
    """r3 large body: transposed one-hot + lhs-T matmul.

    The v1 body's dominant hidden cost was the rel operand: [K, tile, 1]
    lane-pads the trailing singleton to 128, DMA-ing ~tile·K·512 B per
    cell (3× the window itself).  Here rel rides compact as
    [npairs, p·tile] (p = 128//tile neighbor columns pre-folded onto
    lanes, ~4 KB/cell) and the one-hot is built TRANSPOSED
    [width2, p·tile] — a sublane-row broadcast against a sublane iota,
    no lane→sublane relayout — then contracted with the window via a
    dot_general over the sublane dims of both operands (lhs-T matmul,
    native on the MXU).  One [p·tile, width2]-row matmul per pair keeps
    the MXU row-dim full at any tile ≤ 128.  Window DMA starts are
    128-aligned (the shift is pre-absorbed into rel), so the slice needs
    no sublane-offset proof."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    g = b * nt + t
    total = nb * nt

    def win_dma(cell, slot):
        bb = cell // nt
        tt = jax.lax.rem(cell, nt)
        s = pl.multiple_of(starts_ref[tt], 128)
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(s, width2), :], win_ref.at[slot],
            sem.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        win_dma(g + 1, jax.lax.rem(g + 1, 2)).start()

    win_dma(g, slot).wait()
    win = win_ref[slot]                          # [width2, f_pad] f32
    hi = win.astype(jnp.bfloat16)
    lo = (win - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    lanes = p * tile
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (width2, lanes), 0)
    rel = rel_ref[0, 0]                          # [npairs, lanes] int32
    for j in range(npairs):
        ohT = (rel[j : j + 1] == iota_sub).astype(jnp.bfloat16)
        res = jax.lax.dot_general(
            ohT, hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        res = res + jax.lax.dot_general(
            ohT, lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # [lanes, f_pad]
        for q in range(p):
            k = j * p + q
            if k < k_cols:
                out_ref[0, :, k * feat : (k + 1) * feat] = res[
                    q * tile : (q + 1) * tile, :feat
                ].astype(out_ref.dtype)


def _kernel_large3(
    starts_ref, rel_ref, xpT_ref, out_ref, win_ref, sem,
    *, width2, tile, k_cols, feat, f8, nt, nb, p, nchunk,
):
    """r3 large body: transposed window + VPU lane dynamic-gather.

    The one-hot bodies are MXU-flop-bound ~ width x 128 output lanes per
    128 gathered rows, regardless of how few of those lanes carry real
    features — at scale-0 widths (F=8-16, f_pad=128) ~90% of the MXU
    work selects padding.  Here the window rides TRANSPOSED [f8, width2]
    (f8 = F sublane-padded, so the DMA also shrinks ~128/f8x) and each
    128-point row-block is gathered with per-128-lane-chunk
    ``take_along_axis`` on the lane dim + in-range select — VPU work
    ~ f8 x width2 per block instead of MXU work ~ 128 x width2.  Gathers
    are bit-exact f32 (no hi/lo split).  Wide-F shapes stay on v1: the
    VPU work scales with f8 while the one-hot matmul does not, and the
    [f8, 128] -> [128, f8] output relayout grows with f8 too.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    g = b * nt + t
    total = nb * nt

    def win_dma(cell, slot):
        bb = cell // nt
        tt = jax.lax.rem(cell, nt)
        s = pl.multiple_of(starts_ref[tt], 128)
        return pltpu.make_async_copy(
            xpT_ref.at[bb, :, pl.ds(s, width2)], win_ref.at[slot],
            sem.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        win_dma(g + 1, jax.lax.rem(g + 1, 2)).start()

    win_dma(g, slot).wait()
    win = win_ref[slot]                              # [f8, width2] f32
    nwc = width2 // 128
    rel = rel_ref[0, 0]                              # [nchunk, p*tile] int32
    for j in range(nchunk):
        idxb = jnp.broadcast_to(rel[j : j + 1], (f8, p * tile))
        acc = jnp.zeros((f8, p * tile), jnp.float32)
        for c in range(nwc):
            src = win[:, c * 128 : (c + 1) * 128]
            loc = jnp.clip(idxb - c * 128, 0, 127)
            gth = jnp.take_along_axis(src, loc, axis=1)
            m = (idxb >= c * 128) & (idxb < (c + 1) * 128)
            acc = jnp.where(m, gth, acc)
        accT = acc.T                                 # [p*tile, f8]
        for q in range(p):
            k = j * p + q
            if k < k_cols:
                out_ref[0, :, k * feat : (k + 1) * feat] = accT[
                    q * tile : (q + 1) * tile, :feat
                ].astype(out_ref.dtype)


def _kernel_small(
    starts_ref, rel_ref, xp_ref, out_ref, win_ref, sem,
    *, width, tile, k_cols, feat, f_pad,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    s = pl.multiple_of(starts_ref[t], 8)
    copy = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(s, width), :], win_ref, sem
    )
    copy.start()
    rel = rel_ref[0, 0]                      # [tile, K] int32
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (tile, width), 1)
    copy.wait()
    win = win_ref[:]
    hi = win.astype(jnp.bfloat16)
    lo = (win - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # no k-pairing here: Mosaic cannot concat lane-extracted columns
    # ("offset mismatch on non-concat dimension"); small shapes lose
    # little to the 64-row matmuls anyway
    for k in range(k_cols):
        oh = (rel[:, k][:, None] == iota_w).astype(jnp.bfloat16)
        out = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
        out += jnp.dot(oh, lo, preferred_element_type=jnp.float32)
        out_ref[0, :, k * feat : (k + 1) * feat] = out[:, :feat].astype(
            out_ref.dtype
        )


def _select_k_kernel(d_ref, idx_ref, *, width, rows, k):
    """Exact k-smallest selection by iterative min-extraction.

    lax.top_k on TPU runs a full sorting network (~10 ms for the
    window-kNN selection at S3DIS shape, 27% of the windowed step); k
    passes of (min → lowest-index-among-ties → mask) on the VPU do the
    same selection exactly — including top_k's lowest-index tie-break —
    in ~k·4 data passes.
    """
    d = d_ref[0, 0]                              # [rows, width] f32
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    cols = []
    for _ in range(k):
        m = jnp.min(d, axis=1, keepdims=True)
        cand = jnp.where(d == m, iota, width)
        sel = jnp.min(cand, axis=1, keepdims=True)    # [rows, 1]
        cols.append(sel)
        d = jnp.where(iota == sel, jnp.inf, d)
    idx_ref[0, 0] = jnp.concatenate(cols, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "exact", "interpret"))
def select_min_k(
    d: jnp.ndarray, k: int, exact: bool = True, interpret: bool = False
) -> jnp.ndarray:
    """Indices of the k smallest entries per row, ascending.

    d: [B, nt, rows, width] distances.  Returns [B, nt, rows, k] int32.
    exact=True (default) is bit-identical to ``lax.top_k(-d, k)[1]``
    (lowest-index tie-break); exact=False uses the ~2x-faster packed-key
    variant whose tie radius widens to 2^-13 relative (requires
    width <= 1024).
    """
    B, nt, rows, width = d.shape
    assert exact or width <= 1024
    return vma_pallas_call(
        functools.partial(
            _select_k_kernel if exact else _select_k_packed_kernel,
            width=width, rows=rows, k=k,
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, rows, width), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, rows, k), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt, rows, k), jnp.int32),
        interpret=interpret,
    )(d)


def _select_k_packed_kernel(d_ref, idx_ref, *, width, rows, k):
    """2-passes-per-iteration variant: index packed into the low 10
    mantissa bits of the bitcast-monotonic distance key, so each
    extraction is one min-reduce + one mask.  Distances within 2^-13
    relative are treated as ties (broken by index, like top_k); not
    bit-identical to top_k on adversarially close distances."""
    d = d_ref[0, 0]                              # [rows, width] f32
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    # signed-int32 sortable key for floats incl. -inf: XOR negatives
    # with 0x7FFFFFFF (the uint trick's two sign-bit flips cancel, so
    # signed compares order correctly and Mosaic's int32 min applies)
    neg = jnp.where(bits < 0, jnp.int32(0x7FFFFFFF), jnp.int32(0))
    key = bits ^ neg
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    key = (key & jnp.int32(-1024)) | iota
    imax = jnp.int32(0x7FFFFFFF)
    cols = []
    for _ in range(k):
        sel = jnp.min(key, axis=1, keepdims=True)
        cols.append(sel & jnp.int32(1023))
        key = jnp.where(key == sel, imax, key)
    idx_ref[0, 0] = jnp.concatenate(cols, axis=1)


def _bwd_kernel(
    rel_ref, g_ref, wg_ref, *, width, tile, k_cols, feat,
):
    """Transpose of the gather, per tile: wg = Σ_{m,k} onehotᵀ·g.

    Contracting over ALL (m, k) slots at once: the summation over k that
    the gather transpose needs is exactly what a single matmul over the
    flattened (m·K+k) depth axis computes.  ohᵀ [W, tile·K] builds from
    the pre-flattened lane row of rel; g arrives pre-reshaped
    [tile·K, F] in matching (m, k) order and is hi/lo split so the
    backward keeps ~f32 fidelity at bf16 MXU rate.  The caller
    overlap-adds the per-tile windows.
    """
    rel = rel_ref[0, 0]                          # [1, tile*K] int32
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (width, tile * k_cols), 0
    )
    ohT = (rel == iota).astype(jnp.bfloat16)     # [W, tile*K]
    gk = g_ref[0, 0]                             # [tile*K, F] f32
    ghi = gk.astype(jnp.bfloat16)
    glo = (gk - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(ohT, ghi, preferred_element_type=jnp.float32)
    acc += jnp.dot(ohT, glo, preferred_element_type=jnp.float32)
    wg_ref[0, 0] = acc


@functools.partial(
    jax.jit, static_argnames=("n_src", "tile", "pad", "interpret")
)
def windowed_gather_bwd_pallas(
    g: jnp.ndarray,
    idx: jnp.ndarray,
    n_src: int,
    tile: int = 64,
    pad: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """VJP of the same-scale windowed gather: dx[b, idx[b,m,k]] += g[b,m,k].

    Requires M == n_src (stride-1 windows, starts = t·tile exactly), the
    geometry of every neighbor gather on the hot path.  Per tile the
    contribution to its window is a transposed one-hot matmul (Pallas,
    MXU); the overlapping windows are then folded with W/tile static
    shifted adds in XLA — no scatter anywhere.
    """
    from crfconv_tpu.ops.windowed import window_starts

    B, M, K, F = g.shape
    assert M == n_src, "fast windowed-gather bwd requires same-scale geometry"
    starts, width, front = window_starts(M, n_src, tile, pad)
    nt = starts.shape[0]
    assert int(starts[0]) == 0 and (nt == 1 or int(starts[1]) == tile)
    assert width % tile == 0
    m_pad = nt * tile - M

    idx_p = jnp.pad(idx, ((0, 0), (0, m_pad), (0, 0)))
    # (m, k)-flattened layouts so the kernel contracts all slots at once
    g_p = jnp.pad(
        g.astype(jnp.float32).reshape(B, M, K, F),
        ((0, 0), (0, m_pad), (0, 0), (0, 0)),
    ).reshape(B, nt, tile * K, F)
    tile_off = (jnp.arange(nt, dtype=jnp.int32) * tile)[None, :, None, None]
    rel = jnp.clip(
        idx_p.reshape(B, nt, tile, K).astype(jnp.int32) + front - tile_off,
        0, width - 1,
    ).reshape(B, nt, 1, tile * K)

    wg = vma_pallas_call(
        functools.partial(
            _bwd_kernel, width=width, tile=tile, k_cols=K, feat=F
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, tile * K), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile * K, F), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, width, F), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt, width, F), jnp.float32),
        interpret=interpret,
    )(rel, g_p)

    # overlap-add: window t covers xp rows [t·tile, t·tile + width);
    # fold its width/tile blocks onto the padded axis with static shifts
    npad = (nt - 1) * tile + width
    dx_p = jnp.zeros((B, npad, F), jnp.float32)
    blocks = wg.reshape(B, nt, width // tile, tile, F)
    for j in range(width // tile):
        dx_p = dx_p.at[:, j * tile : j * tile + nt * tile].add(
            blocks[:, :, j].reshape(B, nt * tile, F)
        )
    return dx_p[:, front : front + n_src]


@functools.partial(
    jax.jit, static_argnames=("tile", "pad", "interpret", "large_body")
)
def windowed_gather_pallas(
    x: jnp.ndarray,
    idx: jnp.ndarray,
    tile: int = 64,
    pad: int = 128,
    interpret: bool = False,
    large_body: str = "auto",
) -> jnp.ndarray:
    """Window-consistent neighbor gather → [B, M, K, F].

    Same contract as ops.windowed.windowed_gather (XLA fallback).
    ``large_body`` selects the large-gather kernel body.  "v2"
    (transposed one-hot + lhs-T matmul, compact rel layout) is a
    documented NEGATIVE result: despite cutting the rel operand DMA
    ~128x, it measures equal-or-slower than v1 at every model shape
    (B8xN8192-65536, K15/16, F8-32: e.g. 1.73 vs 2.31 ms at K15 F16;
    17.0 vs 20.1 ms at sem3d scale-0 — benchmarks/gather_kernel_bench.py),
    because the kernel is MXU-compute-bound on the one-hot matmuls
    (~65% of bf16 peak), not DMA-bound, and v2's per-pair [lanes,width2]
    matmuls have a worse MXU aspect than v1's [tile,width]xK batch.
    Kept for the A/B harness; default stays "v1".
    """
    from crfconv_tpu.ops.windowed import _pad_src, window_starts

    B, n_src, F = x.shape
    M, K = idx.shape[1], idx.shape[2]
    starts, width, front = window_starts(M, n_src, tile, pad)
    nt = starts.shape[0]
    m_pad = nt * tile - M

    # the HBM->VMEM window DMA requires a 128-aligned minor dimension
    f_pad = -(-F // 128) * 128
    xw = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, f_pad - F)))
    idx_p = jnp.pad(idx, ((0, 0), (0, m_pad), (0, 0)))

    large = M >= LARGE_M
    if large_body == "auto":
        large_body = "v3" if F <= V3_MAX_F else "v1"
    if large and large_body == "v3":
        # transposed-window lane-gather body (see _kernel_large3): the
        # source rides [B, f8, NP] so the window DMA is [f8, width2]
        s_al = (starts // 128) * 128
        shift = starts - s_al
        width2 = -(-(width + int(shift.max())) // 128) * 128
        f8 = -(-F // 8) * 8
        xw3 = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, f8 - F)))
        xp = jnp.swapaxes(_pad_src(xw3, front, width2, s_al), 1, 2)
        starts_j = jnp.asarray(s_al, jnp.int32)
        rel = (
            idx_p.reshape(B, nt, tile, K)
            + front
            - jnp.asarray(s_al, jnp.int32)[None, :, None, None]
        ).astype(jnp.int32)
        rel = jnp.clip(rel, 0, width2 - 1)
        # fold p = 128//tile neighbor columns onto lanes (as in v2)
        p = max(128 // tile, 1)
        nchunk = -(-K // p)
        relk = jnp.swapaxes(rel, 2, 3)               # [B, nt, K, tile]
        relk = jnp.pad(relk, ((0, 0), (0, 0), (0, nchunk * p - K), (0, 0)))
        rel = relk.reshape(B, nt, nchunk, p * tile)
        kernel = functools.partial(
            _kernel_large3, width2=width2, tile=tile, k_cols=K, feat=F,
            f8=f8, nt=nt, nb=B, p=p, nchunk=nchunk,
        )
        rel_spec = pl.BlockSpec(
            (1, 1, nchunk, p * tile), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        win_scratch = pltpu.VMEM((2, f8, width2), jnp.float32)
        sem_scratch = pltpu.SemaphoreType.DMA((2,))
    elif large and large_body == "v2":
        # 128-align the window starts so the DMA slice needs no offset
        # proof; the per-tile shift moves into rel (and into width2)
        s_al = (starts // 128) * 128
        shift = starts - s_al
        width2 = -(-(width + int(shift.max())) // 128) * 128
        xp = _pad_src(xw, front, width2, s_al)
        starts_j = jnp.asarray(s_al, jnp.int32)
        rel = (
            idx_p.reshape(B, nt, tile, K)
            + front
            - jnp.asarray(s_al, jnp.int32)[None, :, None, None]
        ).astype(jnp.int32)
        rel = jnp.clip(rel, 0, width2 - 1)
        # fold p = 128//tile neighbor columns onto lanes: rel_pairs
        # [B, nt, npairs, p·tile], pair j lane q·tile+m ↦ (m, k=j·p+q)
        p = max(128 // tile, 1)
        npairs = -(-K // p)
        relk = jnp.swapaxes(rel, 2, 3)               # [B, nt, K, tile]
        relk = jnp.pad(relk, ((0, 0), (0, 0), (0, npairs * p - K), (0, 0)))
        rel = relk.reshape(B, nt, npairs, p * tile)
        kernel = functools.partial(
            _kernel_large2, width2=width2, tile=tile, k_cols=K, feat=F,
            f_pad=f_pad, nt=nt, nb=B, p=p, npairs=npairs,
        )
        rel_spec = pl.BlockSpec(
            (1, 1, npairs, p * tile), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        win_scratch = pltpu.VMEM((2, width2, f_pad), jnp.float32)
        sem_scratch = pltpu.SemaphoreType.DMA((2,))
    else:
        xp = _pad_src(xw, front, width, starts)                 # [B, NP, Fp]
        starts_j = jnp.asarray(starts, jnp.int32)
        rel = (
            idx_p.reshape(B, nt, tile, K)
            + front
            - starts_j[None, :, None, None]
        ).astype(jnp.int32)
        rel = jnp.clip(rel, 0, width - 1)
        if large:
            # [B, nt, K, tile, 1]: each k-slice is a ready-made sublane
            # column
            rel = jnp.swapaxes(rel, 2, 3)[..., None]
            kernel = functools.partial(
                _kernel_large, width=width, tile=tile, k_cols=K, feat=F,
                f_pad=f_pad, nt=nt, nb=B,
            )
            rel_spec = pl.BlockSpec(
                (1, 1, K, tile, 1), lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            win_scratch = pltpu.VMEM((2, width, f_pad), jnp.float32)
            sem_scratch = pltpu.SemaphoreType.DMA((2,))
        else:
            kernel = functools.partial(
                _kernel_small, width=width, tile=tile, k_cols=K, feat=F,
                f_pad=f_pad,
            )
            rel_spec = pl.BlockSpec(
                (1, 1, tile, K), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            )
            win_scratch = pltpu.VMEM((width, f_pad), jnp.float32)
            sem_scratch = pltpu.SemaphoreType.DMA

    out = vma_pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # starts [nt]
            rel_spec,
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, tile, K * F), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt * tile, K * F), x.dtype),
        scratch_shapes=[win_scratch, sem_scratch],
        interpret=interpret,
    )(starts_j, rel, xp)
    return out.reshape(B, nt * tile, K, F)[:, :M].astype(x.dtype)


# ---------------------------------------------------------------------------
# fused window kNN: distances + k-min selection in one kernel
# ---------------------------------------------------------------------------

def _knn_kernel(
    starts_ref, q_ref, xpT_ref, idx_ref, win_ref, sem,
    *, width, rows, k, front, tile, self_same, exact,
):
    """Per (b, tile): DMA the window's transposed coordinates (4 sublane
    rows: x, y, z, |p|²), form the [rows, width] distance block on the
    VPU (3 broadcast multiply-adds — no MXU depth-3 matmul, no HBM
    round-trip of the block), then run the k-min selection in place.

    This fuses ops/windowed.window_knn's distance einsum with
    select_min_k: the distance block lives and dies in VMEM (VERDICT r2
    next-step #2a — it previously cost a [B, nt, tile, W] HBM write+read
    per scale).

    Window starts are 8-aligned but lane DMA slices must be 128-aligned:
    the copy starts at s0 = ⌊s/128⌋·128 and covers width+128 lanes; the
    off = s − s0 shift is handled by masking the out-of-window columns
    to +inf so the candidate set matches the reference path exactly.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    s = starts_ref[t]
    s0 = pl.multiple_of((s // 128) * 128, 128)
    off = s - s0                                  # 0..120, multiple of 8
    w2 = width + 128
    copy = pltpu.make_async_copy(
        xpT_ref.at[b, :, pl.ds(s0, w2)], win_ref, sem
    )
    copy.start()
    q = q_ref[0, 0]                               # [rows, 4] f32
    copy.wait()
    win = win_ref[:]                              # [8, w2] f32
    # association order matches the reference einsum path exactly
    # ((x + y) + z cross term, then |q|² − 2c + |w|²) so the selected
    # indices are bit-identical to the einsum + top_k formulation
    cross = (
        q[:, 0:1] * win[0:1] + q[:, 1:2] * win[1:2]
    ) + q[:, 2:3] * win[2:3]
    d = (q[:, 3:4] - 2.0 * cross) + win[3:4]      # [rows, w2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, w2), 1)
    # restrict candidates to the true window [off, off + width)
    d = jnp.where((iota < off) | (iota >= off + width), jnp.inf, d)
    if self_same:
        # pin the self edge to column 0 (window_knn contract: col 0 is
        # the query itself; f32 rounding could otherwise let a
        # near-duplicate beat d_self ≈ 0)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, w2), 0)
        self_off = row + (t * tile + front - s0)
        d = jnp.where(iota == self_off, -jnp.inf, d)

    if exact:
        cols = []
        for _ in range(k):
            m = jnp.min(d, axis=1, keepdims=True)
            cand = jnp.where(d == m, iota, w2)
            sel = jnp.min(cand, axis=1, keepdims=True)
            cols.append(sel)
            d = jnp.where(iota == sel, jnp.inf, d)
        rel = jnp.concatenate(cols, axis=1)
    else:
        bits = jax.lax.bitcast_convert_type(d, jnp.int32)
        neg = jnp.where(bits < 0, jnp.int32(0x7FFFFFFF), jnp.int32(0))
        key = (bits ^ neg) & jnp.int32(-2048) | iota
        imax = jnp.int32(0x7FFFFFFF)
        cols = []
        for _ in range(k):
            sel = jnp.min(key, axis=1, keepdims=True)
            cols.append(sel & jnp.int32(2047))
            key = jnp.where(key == sel, imax, key)
        rel = jnp.concatenate(cols, axis=1)
    idx_ref[0, 0] = rel + (s0 - front)


@functools.partial(
    jax.jit,
    static_argnames=("k", "m_out", "tile", "pad", "exact", "interpret"),
)
def window_knn_pallas(
    pos: jnp.ndarray,
    k: int,
    m_out=None,
    query_pos=None,
    tile: int = 64,
    pad: int = 128,
    exact: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused in-window kNN; same contract as ops.windowed.window_knn.

    Returns [B, M, K] int32 global source indices, ascending distance
    (exact=True is bit-identical to the einsum + lax.top_k reference
    path; exact=False treats distances within 2⁻¹³ relative as ties,
    requires width ≤ 1024).
    """
    from crfconv_tpu.ops.windowed import window_starts

    q = pos if query_pos is None else query_pos
    B, M, _ = q.shape
    n_src = pos.shape[1]
    starts, width, front = window_starts(M, n_src, tile, pad)
    assert exact or width + 128 <= 2048   # packed key: 11 index bits
    nt = starts.shape[0]
    m_pad = nt * tile - M

    # queries ride as [B, nt, tile, 4] (x, y, z, |q|²); padded rows get a
    # far sentinel so their distances are finite garbage (sliced off)
    qp = jnp.pad(
        q.astype(jnp.float32), ((0, 0), (0, m_pad), (0, 0)),
        constant_values=1e9,
    )
    qn = jnp.sum(qp * qp, axis=-1, keepdims=True)
    q4 = jnp.concatenate([qp, qn], axis=-1).reshape(B, nt, tile, 4)

    # source rides transposed [B, 8, npad]: rows 0-2 coords, row 3 |p|²,
    # rows 4-7 zero padding for the sublane tile; window DMAs slice the
    # lane axis (start rounded down to 128, hence the +128 coverage).
    # Pad value 2e9 keeps sentinel distances ~4e18 (< f32 max) and
    # strictly larger than any real distance.
    need = (int(starts[-1]) // 128) * 128 + width + 128
    posp = jnp.pad(
        pos.astype(jnp.float32),
        ((0, 0), (front, max(need - n_src - front, 0)), (0, 0)),
        constant_values=2e9,
    )
    pn = jnp.sum(posp * posp, axis=-1, keepdims=True)
    xpT = jnp.swapaxes(
        jnp.pad(jnp.concatenate([posp, pn], axis=-1), ((0, 0), (0, 0), (0, 4))),
        1, 2,
    )                                                    # [B, 8, NP]

    starts_j = jnp.asarray(starts, jnp.int32)
    idx = vma_pallas_call(
        functools.partial(
            _knn_kernel,
            width=width, rows=tile, k=k, front=front, tile=tile,
            self_same=query_pos is None, exact=exact,
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # starts [nt]
            pl.BlockSpec(
                (1, 1, tile, 4), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),           # xpT in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile, k), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt, tile, k), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, width + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(starts_j, q4, xpT)
    idx = jnp.clip(idx.reshape(B, nt * tile, k)[:, :M], 0, n_src - 1)
    return idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# fused weighted gather-reduce (the train-path point-conv contraction)
# ---------------------------------------------------------------------------


def _kernel_weighted_reduce(
    starts_ref, rel_ref, u_ref, xpT_ref, out_ref, xg_ref, win_ref, sem,
    *, width2, tile, k_cols, h8, nt, nb, p, nchunk,
):
    """out_i = Σ_k u_ik ⊙ x_{idx_ik}, with the gathered neighbors also
    written out (xg) as the backward's residual.

    The train-mode point conv cannot fold its BatchNorms (batch
    statistics are data-dependent), so the weight MLP stays in XLA where
    flax computes exact train-mode stats — but the expensive part of the
    unfused body is NOT the MLP: it is gathering [B,N,K,H] neighbor
    features from HBM and the K-contraction round trip.  This kernel
    does both in VMEM: window DMA (transposed [h8, width] layout,
    double-buffered across grid cells as in ops/conv_pallas.py), VPU
    lane dynamic-gathers, multiply by the provided per-edge weights and
    fold over K.  xg is a sequential (cheap) write that saves the
    backward from re-gathering.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    g = b * nt + t
    total = nb * nt

    def win_dma(cell, slot):
        bb = cell // nt
        tt = jax.lax.rem(cell, nt)
        s = pl.multiple_of(starts_ref[tt], 128)
        return pltpu.make_async_copy(
            xpT_ref.at[bb, :, pl.ds(s, width2)], win_ref.at[slot],
            sem.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        win_dma(g + 1, jax.lax.rem(g + 1, 2)).start()

    win_dma(g, slot).wait()
    win = win_ref[slot]                        # [h8, width2] f32
    nwc = width2 // 128
    rel = rel_ref[0, 0]                        # [nchunk, p*tile] int32
    lanes = p * tile

    acc = jnp.zeros((h8, lanes), jnp.float32)
    for j in range(nchunk):
        idxb = jnp.broadcast_to(rel[j : j + 1], (h8, lanes))
        gth = jnp.zeros((h8, lanes), jnp.float32)
        for c in range(nwc):
            src = win[:, c * 128 : (c + 1) * 128]
            loc = jnp.clip(idxb - c * 128, 0, 127)
            gsel = jnp.take_along_axis(src, loc, axis=1)
            m = (idxb >= c * 128) & (idxb < (c + 1) * 128)
            gth = jnp.where(m, gsel, gth)
        xg_ref[0, 0, j] = gth
        acc = acc + u_ref[0, 0, j] * gth
    outv = acc[:, :tile]
    for q in range(1, p):
        outv = outv + acc[:, q * tile : (q + 1) * tile]
    out_ref[0, 0] = outv


@functools.partial(
    jax.jit, static_argnames=("tile", "pad", "interpret")
)
def windowed_weighted_reduce_pallas(
    x: jnp.ndarray,          # [B, N, H] source features
    u: jnp.ndarray,          # [B, N, K, H] per-edge weights
    idx: jnp.ndarray,        # [B, N, K] window-consistent indices
    tile: int = 64,
    pad: int = 128,
    interpret: bool = False,
):
    """Same-scale fused Σ_k u·x_j; returns (out [B,N,H], xg [B,N,K,H])."""
    from crfconv_tpu.ops.windowed import _pad_src, window_starts

    B, N, H = x.shape
    K = idx.shape[2]
    starts, width, front = window_starts(N, N, tile, pad)
    nt = starts.shape[0]
    m_pad = nt * tile - N
    h8 = -(-H // 8) * 8

    s_al = (starts // 128) * 128
    shift = starts - s_al
    width2 = -(-(width + int(shift.max())) // 128) * 128

    src = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, h8 - H)))
    xpT = jnp.swapaxes(_pad_src(src, front, width2, s_al), 1, 2)

    idx_p = jnp.pad(idx, ((0, 0), (0, m_pad), (0, 0)))
    rel = (
        idx_p.reshape(B, nt, tile, K)
        + front
        - jnp.asarray(s_al, jnp.int32)[None, :, None, None]
    ).astype(jnp.int32)
    rel = jnp.clip(rel, 0, width2 - 1)
    p = max(128 // tile, 1)
    nchunk = -(-K // p)
    assert K % p == 0, "dispatcher must route K % p != 0 to the XLA path"
    relk = jnp.swapaxes(rel, 2, 3)                   # [B, nt, K, tile]
    rel_packed = relk.reshape(B, nt, nchunk, p * tile)

    # u → the kernel's [B, nt, nchunk, h8, p*tile] lane layout
    # (lane = q*tile + i, k = j*p + q)
    up = jnp.pad(
        u.astype(jnp.float32),
        ((0, 0), (0, m_pad), (0, 0), (0, h8 - H)),
    )
    up = up.reshape(B, nt, tile, nchunk, p, h8)
    up = jnp.transpose(up, (0, 1, 3, 5, 4, 2))       # [B,nt,nchunk,h8,p,tile]
    u_packed = up.reshape(B, nt, nchunk, h8, p * tile)

    out, xg = vma_pallas_call(
        functools.partial(
            _kernel_weighted_reduce, width2=width2, tile=tile,
            k_cols=K, h8=h8, nt=nt, nb=B, p=p, nchunk=nchunk,
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, nchunk, p * tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, nchunk, h8, p * tile), lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),       # xpT in HBM
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, h8, tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, nchunk, h8, p * tile), lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nt, h8, tile), jnp.float32),
            jax.ShapeDtypeStruct(
                (B, nt, nchunk, h8, p * tile), jnp.float32
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, h8, width2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(s_al, jnp.int32), rel_packed, u_packed, xpT)

    out = jnp.swapaxes(out, 2, 3).reshape(B, nt * tile, h8)
    out = out[:, :N, :H].astype(x.dtype)
    # xg back to [B, N, K, H]
    xg = xg.reshape(B, nt, nchunk, h8, p, tile)
    xg = jnp.transpose(xg, (0, 1, 5, 2, 4, 3))       # [B,nt,tile,nchunk,p,h8]
    xg = xg.reshape(B, nt * tile, nchunk * p, h8)[:, :N, :K, :H]
    return out, xg.astype(x.dtype)
