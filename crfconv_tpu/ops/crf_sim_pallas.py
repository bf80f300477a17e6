"""Fused CRF similarity + first-message kernel (eval, windowed regime).

The continuous CRF decoder (models/crf_conv.py::ContinuousCRFConv,
reference models/continuous_crf_conv_big.py:49-72) spends its setup on
one windowed gather of [y, z] ([B, N, K, 2H] through HBM), a Gaussian
similarity softmax over K, and the first mean-field message Σ_k s·z_k.
This kernel computes all three in ONE Pallas pass per 128-point block:

  * the candidate window of [y | z] rides VMEM (transposed [2·h8, width]
    layout, double-buffered DMA — the same pattern as the fused
    point-conv kernel, ops/conv_pallas.py);
  * neighbors come from VPU lane dynamic-gathers;
  * d_k = ‖y_i − y_j‖², softmax over K (max/sum folds across the p
    lane blocks sharing a point), and msg = Σ_k s_k z_k all stay
    on-chip — nothing [B, N, K, H]-shaped ever touches HBM.

Outputs (msg [B,N,H], s [B,N,K]): at steps=1 the caller applies
``x = (z + msg·C)(I+C)⁻¹`` directly (no gather left at all); at
steps≥2 the s feeds ``crf_pallas.crf_core`` (whose banded setup only
needs s, never the gathered neighbors).

Eval-only, like the fused point-conv: training keeps the unfused path
(which has its own fused VJPs).  K is NOT required to divide the lane
fold — padded k slots are masked out of the softmax statically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crfconv_tpu.ops.pallas_vma import pallas_call as vma_pallas_call

# Test hook (interpret mode off-TPU) and row-count floor, mirroring
# ops/conv_pallas.py.
SIM_INTERPRET = False
SIM_MIN_ROWS = 4096
SIM_MAX_H = 32


def sim_eligible(train, hidden, n_rows, mode) -> bool:
    """Dispatch guard for models.ContinuousCRFConv."""
    if train or mode["mode"] != "windowed" or hidden > SIM_MAX_H:
        return False
    if n_rows < SIM_MIN_ROWS:
        return False
    h8 = -(-hidden // 8) * 8
    width2 = -(-(mode["tile"] + 2 * mode["pad"]) // 128) * 128 + 128
    if 2 * 2 * h8 * width2 * 4 > 12 * 2**20:
        return False
    return SIM_INTERPRET or jax.default_backend() == "tpu"


def _kernel_sim(
    starts_ref, rel_ref, ctr_ref, src_ref,
    msg_ref, s_ref, win_ref, sem,
    *, width2, tile, k_cols, h8, f8, nt, nb, p, nchunk,
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
            src_ref.at[bb, :, pl.ds(s, width2)], win_ref.at[slot],
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
    win = win_ref[slot]                        # [f8 = 2·h8, width2] f32
    nwc = width2 // 128
    rel = rel_ref[0, 0]                        # [nchunk, p*tile] int32
    ctr = ctr_ref[0, 0]                        # [h8, p*tile] center y_i
    lanes = p * tile

    # pass 1: lane-gather [y_j | z_j] per chunk, keep d_j and z_j
    ds = []
    zs = []
    for j in range(nchunk):
        idxb = jnp.broadcast_to(rel[j : j + 1], (f8, lanes))
        gth = jnp.zeros((f8, lanes), jnp.float32)
        for c in range(nwc):
            src = win[:, c * 128 : (c + 1) * 128]
            loc = jnp.clip(idxb - c * 128, 0, 127)
            gsel = jnp.take_along_axis(src, loc, axis=1)
            m = (idxb >= c * 128) & (idxb < (c + 1) * 128)
            gth = jnp.where(m, gsel, gth)
        diff = ctr - gth[:h8]
        ds.append(jnp.sum(diff * diff, axis=0, keepdims=True))  # [1, lanes]
        zs.append(gth[h8:])                                     # [h8, lanes]

    def valid(j, q):
        return j * p + q < k_cols

    # softmax statistics folded over k = (j, q): max then sum-exp.
    # Per-point stats live in the first tile block and are re-tiled.
    neg_inf = jnp.float32(-1e30)
    m = jnp.full((1, tile), neg_inf)
    for j in range(nchunk):
        for q in range(p):
            if valid(j, q):
                m = jnp.maximum(m, -ds[j][:, q * tile : (q + 1) * tile])
    m_l = jnp.tile(m, (1, p))                                   # [1, lanes]

    sumexp = jnp.zeros((1, tile), jnp.float32)
    es = []
    for j in range(nchunk):
        e = jnp.exp(-ds[j] - m_l)                               # [1, lanes]
        es.append(e)
        for q in range(p):
            if valid(j, q):
                sumexp = sumexp + e[:, q * tile : (q + 1) * tile]
    denom = jnp.maximum(sumexp, 1e-30)
    inv_l = jnp.tile(1.0 / denom, (1, p))                       # [1, lanes]

    msg = jnp.zeros((h8, tile), jnp.float32)
    for j in range(nchunk):
        sj = es[j] * inv_l                                      # [1, lanes]
        contrib = zs[j] * sj                                    # [h8, lanes]
        for q in range(p):
            if valid(j, q):
                msg = msg + contrib[:, q * tile : (q + 1) * tile]
        s_ref[0, 0, j] = sj[0]
    msg_ref[0, 0] = msg


@functools.partial(jax.jit, static_argnames=("tile", "pad", "interpret"))
def crf_similarity_message(
    y: jnp.ndarray,        # [B, N, H] guidance features (pairwise head)
    z: jnp.ndarray,        # [B, N, H] unary state (upsampled unary head)
    idx: jnp.ndarray,      # [B, N, K] window-consistent indices, self REMOVED
    tile: int = 64,
    pad: int = 128,
    interpret: bool = False,
):
    """Returns (msg [B, N, H], s [B, N, K]) with
    s = softmax_K(−‖y_i − y_j‖²) and msg = Σ_k s_k · z_k."""
    from crfconv_tpu.ops.windowed import _pad_src, window_starts

    B, N, H = y.shape
    K = idx.shape[2]
    starts, width, front = window_starts(N, N, tile, pad)
    nt = starts.shape[0]
    m_pad = nt * tile - N
    h8 = -(-H // 8) * 8
    f8 = 2 * h8

    s_al = (starts // 128) * 128
    shift = starts - s_al
    width2 = -(-(width + int(shift.max())) // 128) * 128

    src = jnp.concatenate(
        [
            jnp.pad(y.astype(jnp.float32), ((0, 0), (0, 0), (0, h8 - H))),
            jnp.pad(z.astype(jnp.float32), ((0, 0), (0, 0), (0, h8 - H))),
        ],
        axis=-1,
    )
    srcT = jnp.swapaxes(_pad_src(src, front, width2, s_al), 1, 2)

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

    ctile = jnp.pad(
        jnp.swapaxes(y.astype(jnp.float32), 1, 2),   # [B, H, N]
        ((0, 0), (0, h8 - H), (0, 0)),
    )
    ctile = jnp.pad(ctile, ((0, 0), (0, 0), (0, m_pad)))
    ctile = ctile.reshape(B, h8, nt, tile)
    ctile = jnp.swapaxes(ctile, 1, 2)                # [B, nt, h8, tile]
    ctr = jnp.tile(ctile, (1, 1, 1, p))              # [B, nt, h8, p*tile]

    msg, s_pk = vma_pallas_call(
        functools.partial(
            _kernel_sim, width2=width2, tile=tile, k_cols=K, h8=h8,
            f8=f8, nt=nt, nb=B, p=p, nchunk=nchunk,
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, nchunk, p * tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, h8, p * tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),       # srcT in HBM
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, h8, tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, nchunk, p * tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nt, h8, tile), jnp.float32),
            jax.ShapeDtypeStruct((B, nt, nchunk, p * tile), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, f8, width2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(s_al, jnp.int32), rel_packed, ctr, srcT)

    msg = jnp.swapaxes(msg, 2, 3).reshape(B, nt * tile, h8)
    msg = msg[:, :N, :H].astype(z.dtype)
    # unpack s: [B, nt, nchunk, p, tile] -> [B, nt, tile, nchunk*p] -> K
    s = s_pk.reshape(B, nt, nchunk, p, tile)
    s = jnp.transpose(s, (0, 1, 4, 2, 3)).reshape(B, nt * tile, nchunk * p)
    s = s[:, :N, :K].astype(y.dtype)
    return msg, s
