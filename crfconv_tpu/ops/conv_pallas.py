"""Fused windowed point-conv inference kernel.

One Pallas pass computes, per output point, the whole PointConv body
(models/point_conv_big.py, reference models/point_conv_big.py:8-58):

    out = sum_k  MLP1(leaky01(MLP0(pos_i - pos_j)))  *  x_j

for the same-scale (symmetric) case in eval mode.  The unfused path
materializes the gathered neighbors [B,N,K,3+H], the relative positions
[B,N,K,3] and the two weight-MLP activations [B,N,K,H] in HBM — ~1.5 GB
of round-trips per scale-0 Semantic3D block on top of the gather kernel
itself.  Here the candidate window rides VMEM-resident (transposed
[f8, width] layout as in windowed_pallas._kernel_large3), neighbors are
selected with VPU lane dynamic-gathers, and the two weight matmuls run
on the MXU per 128-point block — nothing [*, K, *]-shaped ever touches
HBM.

Eval-only: batch norm in eval mode is a per-feature affine, folded into
(a, c) pairs outside the kernel (train mode needs global batch
statistics mid-MLP, which a per-tile kernel cannot produce — training
keeps the unfused path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crfconv_tpu.ops.pallas_vma import pallas_call as vma_pallas_call

# Widest hidden dim routed to the fused kernel.  Armed at 32 by the
# hardware A/B (benchmarks/conv_fused_bench.py, TPU v5e, r3): the fused
# kernel wins at every measured shape — sem3d-scale0 22.6→5.4 ms
# (4.2×), sem3d-scale0-h32 33.2→10.5 ms (3.2×), s3dis-scale0 1.77→0.83
# ms, strided s3dis-str2 1.61→0.25 ms, sem3d-str2 12.1→4.6 ms.  H>32
# (the two coarsest scales) is unmeasured and those row counts fall
# under FUSED_MIN_ROWS anyway.
FUSED_MAX_H = 32
# Test hook: run the kernel in interpret mode off-TPU.
FUSED_INTERPRET = False
# Smallest output-row count worth a kernel launch (A/B harness patches
# this to 0 so small shapes still engage the kernel for measurement).
FUSED_MIN_ROWS = 4096


def train_fused_eligible(train, sub_pos, extra, hidden, n_rows, k, mode) -> bool:
    """Dispatch guard for the TRAIN-path fused contraction
    (ops/windowed.py::weighted_gather_reduce): same-scale eval-ineligible
    case where the weight MLP must stay in flax (train-mode batch
    statistics) but the x-gather + K-reduction can still run fused.
    Under a spatial (point-sharded) context the unfused funnel handles
    halo routing, so this stays off there."""
    if not train or sub_pos is not None or extra is not None:
        return False
    if mode["mode"] != "windowed" or hidden > FUSED_MAX_H:
        return False
    p = max(128 // mode["tile"], 1)
    if k % p != 0 or n_rows < FUSED_MIN_ROWS:
        return False
    from crfconv_tpu.ops import spatial_state

    if spatial_state.current() is not None:
        return False
    from crfconv_tpu.ops.windowed import WGR_INTERPRET

    h8 = -(-hidden // 8) * 8
    width2 = -(-(mode["tile"] + 2 * mode["pad"]) // 128) * 128 + 128
    if 2 * h8 * width2 * 4 > 12 * 2**20:
        return False
    return WGR_INTERPRET or jax.default_backend() == "tpu"


def fused_eligible(train, sub_pos, extra, hidden, n_rows, k, mode) -> bool:
    """Dispatch guard for models.PointConv: eval-mode, windowed regime,
    K divisible by the lane fold, armed width.  Covers the same-scale
    body and the strided body with the residual max-pool rider (but not
    strided-without-rider, which no model block emits)."""
    if train or (sub_pos is None) != (extra is None):
        return False
    if mode["mode"] != "windowed" or hidden > FUSED_MAX_H:
        return False
    # Under a spatial (point-sharded) context the caller routes through
    # parallel.spatial_forward.spatial_point_conv_fused, which runs this
    # same kernel on the halo-extended frame (exact by the affine window
    # geometry) and falls back to the unfused funnel when the halo is
    # infeasible for the frame.
    p = max(128 // mode["tile"], 1)
    if k % p != 0 or n_rows < FUSED_MIN_ROWS:
        return False
    # VMEM budget: the double-buffered transposed window scratch is
    # [2, f8, width2] f32 (f8 = 8 + hidden + rider rows, width2 ≈
    # tile + 2·pad rounded up to 128, plus the start-alignment slack).
    # Stay within the same 12 MB envelope windowed_gather enforces so a
    # pathological tile/pad/H/R config falls back to the unfused path
    # instead of dying in the Mosaic compiler.
    h8 = -(-hidden // 8) * 8
    r8 = 0 if extra is None else -(-extra.shape[-1] // 8) * 8
    f8 = 8 + h8 + r8
    width2 = -(-(mode["tile"] + 2 * mode["pad"]) // 128) * 128 + 128
    if 2 * f8 * width2 * 4 > 12 * 2**20:
        return False
    return FUSED_INTERPRET or jax.default_backend() == "tpu"


def _kernel_conv(
    starts_ref, rel_ref, ctr_ref, w0_ref, w1_ref, aff_ref, xpT_ref,
    out_ref, win_ref, sem,
    *, width2, tile, k_cols, h8, f8, nt, nb, p, nchunk, slope,
):
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
    win = win_ref[slot]                        # [f8, width2] f32
    nwc = width2 // 128
    rel = rel_ref[0, 0]                        # [nchunk, p*tile] int32
    ctr = ctr_ref[0, 0]                        # [8, p*tile]; rows 3-7 zero
    w0 = w0_ref[:]                             # [8, h8]; rows 3-7 zero
    w1 = w1_ref[:]                             # [h8, h8]
    aff = aff_ref[:]                           # [4, h8]: a0, c0, a1, c1
    lanes = p * tile

    acc = jnp.zeros((h8, lanes), jnp.float32)
    for j in range(nchunk):
        idxb = jnp.broadcast_to(rel[j : j + 1], (f8, lanes))
        gth = jnp.zeros((f8, lanes), jnp.float32)
        for c in range(nwc):
            src = win[:, c * 128 : (c + 1) * 128]
            loc = jnp.clip(idxb - c * 128, 0, 127)
            gsel = jnp.take_along_axis(src, loc, axis=1)
            m = (idxb >= c * 128) & (idxb < (c + 1) * 128)
            gth = jnp.where(m, gsel, gth)
        relp = ctr - gth[:8]                   # [8, lanes]; rows 3-7 zero
        # weight MLP: t0 = BN0(rel @ W0) with BN folded to affine
        t0 = jax.lax.dot_general(
            w0, relp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # [h8, lanes]
        t0 = t0 * aff[0][:, None] + aff[1][:, None]
        t0 = jnp.where(t0 >= 0, t0, slope * t0)
        u = jax.lax.dot_general(
            w1, t0, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # [h8, lanes]
        u = u * aff[2][:, None] + aff[3][:, None]
        acc = acc + u * gth[8 : 8 + h8]
    # fold the p neighbor columns sharing each point's lanes
    outv = acc[:, :tile]
    for q in range(1, p):
        outv = outv + acc[:, q * tile : (q + 1) * tile]
    out_ref[0, 0] = outv


def _kernel_conv_strided(
    starts_ref, rel_ref, ctr_ref, w0_ref, w1_ref, aff_ref, xpT_ref,
    out_ref, win_ref, sem,
    *, width2, tile, k_cols, h8, r8, f8, nt, nb, p, nchunk, slope,
):
    """Strided body: adds the residual rider — gathered residual rows are
    max-pooled over K in the same pass (reference strided residual pool,
    models/point_conv_big.py:74-77)."""
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
    win = win_ref[slot]                        # [f8, width2] f32
    nwc = width2 // 128
    rel = rel_ref[0, 0]
    ctr = ctr_ref[0, 0]
    w0 = w0_ref[:]
    w1 = w1_ref[:]
    aff = aff_ref[:]
    lanes = p * tile

    acc = jnp.zeros((h8, lanes), jnp.float32)
    acc_r = jnp.full((r8, lanes), -jnp.inf, jnp.float32)
    for j in range(nchunk):
        idxb = jnp.broadcast_to(rel[j : j + 1], (f8, lanes))
        gth = jnp.zeros((f8, lanes), jnp.float32)
        for c in range(nwc):
            src = win[:, c * 128 : (c + 1) * 128]
            loc = jnp.clip(idxb - c * 128, 0, 127)
            gsel = jnp.take_along_axis(src, loc, axis=1)
            m = (idxb >= c * 128) & (idxb < (c + 1) * 128)
            gth = jnp.where(m, gsel, gth)
        relp = ctr - gth[:8]
        t0 = jax.lax.dot_general(
            w0, relp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t0 = t0 * aff[0][:, None] + aff[1][:, None]
        t0 = jnp.where(t0 >= 0, t0, slope * t0)
        u = jax.lax.dot_general(
            w1, t0, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        u = u * aff[2][:, None] + aff[3][:, None]
        acc = acc + u * gth[8 : 8 + h8]
        acc_r = jnp.maximum(acc_r, gth[8 + h8 : 8 + h8 + r8])
    outv = acc[:, :tile]
    outr = acc_r[:, :tile]
    for q in range(1, p):
        outv = outv + acc[:, q * tile : (q + 1) * tile]
        outr = jnp.maximum(outr, acc_r[:, q * tile : (q + 1) * tile])
    out_ref[0, 0, :h8] = outv
    out_ref[0, 0, h8:] = outr


@functools.partial(
    jax.jit, static_argnames=("tile", "pad", "interpret", "slope")
)
def point_conv_fused_strided(
    x: jnp.ndarray,          # [B, N, H] fine-scale hidden features
    pos: jnp.ndarray,        # [B, N, 3] fine-scale positions
    sub_pos: jnp.ndarray,    # [B, M, 3] coarse positions
    idx: jnp.ndarray,        # [B, M, K] window-consistent indices into N
    res: jnp.ndarray,        # [B, N, R] residual rider (max-pooled over K)
    w0: jnp.ndarray, a0: jnp.ndarray, c0: jnp.ndarray,
    w1: jnp.ndarray, a1: jnp.ndarray, c1: jnp.ndarray,
    tile: int = 64,
    pad: int = 128,
    interpret: bool = False,
    slope: float = 0.1,
):
    """Strided fused point conv: returns (out [B, M, H], res_max [B, M, R]).

    Runs unchanged inside a shard_map (the spatial forward): the
    pallas_vma wrapper infers the output's varying axes from the
    operands and pvary's the replicated constants."""
    from crfconv_tpu.ops.windowed import _pad_src, window_starts

    B, N, H = x.shape
    M, K = idx.shape[1], idx.shape[2]
    R = res.shape[-1]
    starts, width, front = window_starts(M, N, tile, pad)
    nt = starts.shape[0]
    m_pad = nt * tile - M
    h8 = -(-H // 8) * 8
    r8 = -(-R // 8) * 8
    f8 = 8 + h8 + r8

    s_al = (starts // 128) * 128
    shift = starts - s_al
    width2 = -(-(width + int(shift.max())) // 128) * 128

    src = jnp.concatenate(
        [
            pos.astype(jnp.float32),
            jnp.zeros((B, N, 5), jnp.float32),
            jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, h8 - H))),
            jnp.pad(res.astype(jnp.float32), ((0, 0), (0, 0), (0, r8 - R))),
        ],
        axis=-1,
    )
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
    assert K % p == 0, "dispatcher must route K % p != 0 to the unfused path"
    relk = jnp.swapaxes(rel, 2, 3)
    relk = jnp.pad(relk, ((0, 0), (0, 0), (0, nchunk * p - K), (0, 0)))
    rel_packed = relk.reshape(B, nt, nchunk, p * tile)

    ctile = jnp.pad(
        jnp.swapaxes(sub_pos.astype(jnp.float32), 1, 2),  # [B, 3, M]
        ((0, 0), (0, 5), (0, 0)),
    )
    ctile = jnp.pad(ctile, ((0, 0), (0, 0), (0, m_pad)))
    ctile = ctile.reshape(B, 8, nt, tile)
    ctile = jnp.swapaxes(ctile, 1, 2)
    ctr = jnp.tile(ctile, (1, 1, 1, p))

    w0e = jnp.zeros((8, h8), jnp.float32).at[:3, :H].set(
        w0.astype(jnp.float32)
    )
    w1e = jnp.zeros((h8, h8), jnp.float32).at[:H, :H].set(
        w1.astype(jnp.float32)
    )
    aff = jnp.zeros((4, h8), jnp.float32)
    aff = aff.at[0, :H].set(a0.astype(jnp.float32))
    aff = aff.at[1, :H].set(c0.astype(jnp.float32))
    aff = aff.at[2, :H].set(a1.astype(jnp.float32))
    aff = aff.at[3, :H].set(c1.astype(jnp.float32))

    out = vma_pallas_call(
        functools.partial(
            _kernel_conv_strided, width2=width2, tile=tile, k_cols=K,
            h8=h8, r8=r8, f8=f8, nt=nt, nb=B, p=p, nchunk=nchunk,
            slope=slope,
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, nchunk, p * tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8, p * tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h8 + r8, tile), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt, h8 + r8, tile), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, f8, width2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(s_al, jnp.int32), rel_packed, ctr, w0e, w1e, aff, xpT)
    out = jnp.swapaxes(out, 2, 3).reshape(B, nt * tile, h8 + r8)
    conv = out[:, :M, :H].astype(x.dtype)
    res_max = out[:, :M, h8 : h8 + R].astype(res.dtype)
    return conv, res_max


@functools.partial(
    jax.jit, static_argnames=("tile", "pad", "interpret", "slope")
)
def point_conv_fused_infer(
    x: jnp.ndarray,          # [B, N, H] hidden features (lin_in output)
    pos: jnp.ndarray,        # [B, N, 3]
    idx: jnp.ndarray,        # [B, N, K] window-consistent neighbor indices
    w0: jnp.ndarray,         # [3, H] first weight-MLP kernel
    a0: jnp.ndarray,         # [H] folded BN0 scale
    c0: jnp.ndarray,         # [H] folded BN0 shift
    w1: jnp.ndarray,         # [H, H] second weight-MLP kernel
    a1: jnp.ndarray,         # [H] folded BN1 scale
    c1: jnp.ndarray,         # [H] folded BN1 shift
    tile: int = 64,
    pad: int = 128,
    interpret: bool = False,
    slope: float = 0.1,
) -> jnp.ndarray:
    """Same-scale fused point conv: returns [B, N, H] eval-mode output."""
    from crfconv_tpu.ops.windowed import _pad_src, window_starts

    B, N, H = x.shape
    K = idx.shape[2]
    starts, width, front = window_starts(N, N, tile, pad)
    nt = starts.shape[0]
    m_pad = nt * tile - N
    h8 = -(-H // 8) * 8
    f8 = 8 + h8

    s_al = (starts // 128) * 128
    shift = starts - s_al
    width2 = -(-(width + int(shift.max())) // 128) * 128

    # source layout: rows 0-2 pos, rows 3-7 zero, rows 8.. features
    src = jnp.concatenate(
        [
            pos.astype(jnp.float32),
            jnp.zeros((B, N, 5), jnp.float32),
            jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, h8 - H))),
        ],
        axis=-1,
    )
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
    relk = jnp.swapaxes(rel, 2, 3)                   # [B, nt, K, tile]
    relk = jnp.pad(relk, ((0, 0), (0, 0), (0, nchunk * p - K), (0, 0)))
    rel_packed = relk.reshape(B, nt, nchunk, p * tile)

    # center positions in the same lane layout (repeated per k column)
    ctile = jnp.pad(
        jnp.swapaxes(pos.astype(jnp.float32), 1, 2),  # [B, 3, N]
        ((0, 0), (0, 5), (0, 0)),
    )
    ctile = jnp.pad(ctile, ((0, 0), (0, 0), (0, m_pad)))
    ctile = ctile.reshape(B, 8, nt, tile)
    ctile = jnp.swapaxes(ctile, 1, 2)                # [B, nt, 8, tile]
    ctr = jnp.tile(ctile, (1, 1, 1, p))              # [B, nt, 8, p*tile]

    assert K % p == 0, (
        f"fused point conv requires K ({K}) divisible by the lane fold "
        f"p ({p}); dispatcher must route other K to the unfused path"
    )

    h8a = h8
    w0e = jnp.zeros((8, h8a), jnp.float32).at[:3, :H].set(
        w0.astype(jnp.float32)
    )
    w1e = jnp.zeros((h8a, h8a), jnp.float32).at[:H, :H].set(
        w1.astype(jnp.float32)
    )
    aff = jnp.zeros((4, h8a), jnp.float32)
    aff = aff.at[0, :H].set(a0.astype(jnp.float32))
    aff = aff.at[1, :H].set(c0.astype(jnp.float32))
    aff = aff.at[2, :H].set(a1.astype(jnp.float32))
    aff = aff.at[3, :H].set(c1.astype(jnp.float32))

    out = vma_pallas_call(
        functools.partial(
            _kernel_conv, width2=width2, tile=tile, k_cols=K, h8=h8a,
            f8=f8, nt=nt, nb=B, p=p, nchunk=nchunk, slope=slope,
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, nchunk, p * tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8, p * tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w0e
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1e
            pl.BlockSpec(memory_space=pltpu.VMEM),   # aff
            pl.BlockSpec(memory_space=pl.ANY),       # xpT in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h8a, tile), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt, h8a, tile), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, f8, width2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(s_al, jnp.int32), rel_packed, ctr, w0e, w1e, aff, xpT)
    out = jnp.swapaxes(out, 2, 3).reshape(B, nt * tile, h8a)
    return out[:, :N, :H].astype(x.dtype)
