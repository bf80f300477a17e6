"""Pallas kernel for the windowed neighbor gather.

Per (batch, tile) grid cell: DMA the tile's candidate window from HBM
into VMEM, build one-hot selection matrices on the fly in VMEM (the XLA
fallback materializes ~1 GB of one-hots per layer in HBM), and select
rows with K small MXU matmuls.  Values are kept at ~f32 fidelity by a
hi/lo bf16 split of the window (the one-hot operand is exactly
representable, so two bf16 passes reconstruct the source to ~2⁻¹⁶
relative error).

Shapes are arranged for Mosaic's tiling rules: `rel` rides as
[B, nt, tile, K] (block = full trailing dims), the output as
[B, nt·tile, K·F], and the one-hot is built per k-column so no vector
relayouts are needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
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
    for k in range(k_cols):
        oh = (rel[:, k][:, None] == iota_w).astype(jnp.bfloat16)
        out = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
        out += jnp.dot(oh, lo, preferred_element_type=jnp.float32)
        out_ref[0, :, k * feat : (k + 1) * feat] = out[:, :feat].astype(
            out_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("tile", "pad", "interpret"))
def windowed_gather_pallas(
    x: jnp.ndarray,
    idx: jnp.ndarray,
    tile: int = 128,
    pad: int = 192,
    interpret: bool = False,
) -> jnp.ndarray:
    """Window-consistent neighbor gather → [B, M, K, F].

    Same contract as ops.windowed.windowed_gather (XLA fallback).
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
    xp = _pad_src(xw, front, width, starts)                     # [B, NP, Fp]
    idx_p = jnp.pad(idx, ((0, 0), (0, m_pad), (0, 0)))
    starts_j = jnp.asarray(starts, jnp.int32)
    rel = (
        idx_p.reshape(B, nt, tile, K)
        + front
        - starts_j[None, :, None, None]
    ).astype(jnp.int32)
    rel = jnp.clip(rel, 0, width - 1)

    out = pl.pallas_call(
        functools.partial(
            _kernel, width=width, tile=tile, k_cols=K, feat=F, f_pad=f_pad
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # starts [nt]
            pl.BlockSpec(
                (1, 1, tile, K), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),   # xp stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, tile, K * F), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt * tile, K * F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((width, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(starts_j, rel, xp)
    return out.reshape(B, nt * tile, K, F)[:, :M].astype(x.dtype)
