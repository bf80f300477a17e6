"""Fused Pallas kernel for the continuous-CRF mean-field loop.

The reference iterates x ← (z + (Σ_k s·x_k) C)(I+C)⁻¹ with one gather →
reduce → two matmuls per step (models/continuous_crf_conv_big.py:63-72);
the XLA scan translation pays one HBM round-trip of x (and a [B,N,K,H]
message intermediate) per step.  This kernel removes all of it:

  * The iteration is LINEAR:  x_{t+1} = z·inv + S̃ x_t (C·inv)  with a
    loop-invariant sparse message matrix S̃ (row i holds s[i,k] at column
    idx[i,k]).  In the windowed regime S̃ is banded: each output tile's
    neighbors live in a fixed window of the Morton order, so S̃ restricted
    to tile i is a dense [tile, W] block A_i = Σ_k s_k·onehot(rel_k).
  * A_i is built ONCE per call (kernel 1, VPU compares, hi/lo bf16 split
    for ~2⁻¹⁷ fidelity) instead of gathering per step.
  * Kernel 2 keeps x TRANSPOSED [H, N_pad] resident in VMEM across all
    steps (ping-pong buffers, Jacobi semantics identical to the scan) and
    streams A tiles from HBM double-buffered against the MXU matmuls.
    Per step per tile: 3 bf16 matmuls [H,W]×[W,tile] (hi·hi, lo·hi,
    hi·lo) + one tiny [H,H] apply — no HBM traffic for x at all.

Layouts are chosen for Mosaic's tiling rules: H rides on sublanes
(padded to ≥16 for bf16), N on lanes; window starts are exact multiples
of the 128-lane tile because CRF windows are always same-scale
(stride 1), and `front` is rounded up to 128 so the write offsets are
lane-aligned too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crfconv_tpu.ops.pallas_vma import pallas_call as vma_pallas_call


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# kernel 1: build the banded message blocks Aᵀ (weighted one-hot, hi/lo bf16)
# ---------------------------------------------------------------------------

def _build_at_kernel(sT_ref, relT_ref, ahi_ref, alo_ref, *, w, tile, k_cols):
    sT = sT_ref[0, 0]        # [K, tile] f32
    relT = relT_ref[0, 0]    # [K, tile] int32
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, tile), 0)
    acc = jnp.zeros((w, tile), jnp.float32)
    for k in range(k_cols):
        # duplicate indices accumulate their weights, exactly like the
        # scan's independent per-k contributions
        acc = acc + jnp.where(
            relT[k][None, :] == iota_w, sT[k][None, :], 0.0
        )
    hi = acc.astype(jnp.bfloat16)
    ahi_ref[0, 0] = hi
    alo_ref[0, 0] = (acc - hi.astype(jnp.float32)).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# kernel 2: iterate x ← z' + S̃ x M fully on-chip
# ---------------------------------------------------------------------------

def _iterate_kernel(
    zT_ref, zpT_ref, ahi_ref, alo_ref, mt_ref, out_ref,
    xbuf, zpbuf, abuf, sem_init, sem_a, sem_out,
    *, steps, nt, tile, w, front, hp, npad,
):
    b = pl.program_id(0)
    cp_z = pltpu.make_async_copy(zT_ref.at[b], xbuf.at[0], sem_init.at[0])
    cp_zp = pltpu.make_async_copy(zpT_ref.at[b], zpbuf, sem_init.at[1])
    cp_z.start()
    cp_zp.start()

    def a_copies(g, slot):
        j = jax.lax.rem(g, nt)
        return (
            pltpu.make_async_copy(
                ahi_ref.at[b, j], abuf.at[slot, 0], sem_a.at[slot, 0]
            ),
            pltpu.make_async_copy(
                alo_ref.at[b, j], abuf.at[slot, 1], sem_a.at[slot, 1]
            ),
        )

    h0, l0 = a_copies(0, 0)
    h0.start()
    l0.start()
    cp_z.wait()
    cp_zp.wait()
    # The ping-pong buffer's halo/tail rows are only ever READ (windows
    # overlap the band edges, A is zero there) — they must be finite, not
    # uninitialized garbage, because NaN·0 = NaN in the matmul.
    xbuf[1] = jnp.zeros((hp, npad), jnp.float32)
    mt = mt_ref[:]                                   # [hp, hp] f32

    total = steps * nt
    for t in range(steps):
        src, dst = t % 2, (t + 1) % 2

        def tile_body(i, carry, t=t, src=src, dst=dst):
            g = t * nt + i
            slot = jax.lax.rem(g, 2)

            @pl.when(g + 1 < total)
            def _():
                nh, nl = a_copies(g + 1, jax.lax.rem(g + 1, 2))
                nh.start()
                nl.start()

            ch, cl = a_copies(g, slot)
            ch.wait()
            cl.wait()

            r0 = pl.multiple_of(i * tile, 128)
            win = xbuf[src, :, pl.ds(r0, w)]         # [hp, w] f32
            whi = win.astype(jnp.bfloat16)
            wlo = (win - whi.astype(jnp.float32)).astype(jnp.bfloat16)
            ahi = abuf[slot, 0]                      # [w, tile] bf16
            alo = abuf[slot, 1]
            msg = (
                jnp.dot(whi, ahi, preferred_element_type=jnp.float32)
                + jnp.dot(wlo, ahi, preferred_element_type=jnp.float32)
                + jnp.dot(whi, alo, preferred_element_type=jnp.float32)
            )                                        # [hp, tile] msgᵀ
            o0 = pl.multiple_of(front + i * tile, 128)
            # f32×f32 dot MUST pin precision: the platform default lowers
            # to one bf16 MXU pass (~1e-2 rel error, compounding per step)
            xnew = zpbuf[:, pl.ds(o0, tile)] + jnp.dot(
                mt, msg, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            xbuf[dst, :, pl.ds(o0, tile)] = xnew
            return carry

        jax.lax.fori_loop(0, nt, tile_body, 0)

    done = pltpu.make_async_copy(
        xbuf.at[steps % 2], out_ref.at[b], sem_out
    )
    done.start()
    done.wait()


def _banded_setup(weights, idx, N, tile, pad, interpret):
    """Shared fused-CRF setup: kernel geometry (128-row tiles decoupled
    from the pyramid tile) + the banded weighted-selection blocks A
    (hi/lo bf16), built once per call."""
    from crfconv_tpu.ops.windowed import window_starts

    B, _, K = idx.shape
    starts0, width0, front0 = window_starts(N, N, tile, pad)
    assert int(starts0[0]) == 0 and (
        starts0.shape[0] == 1 or int(starts0[1]) == tile
    ), "fused CRF requires same-scale windows"
    # the 128-row kernel tiles must cover whole pyramid tiles, or the
    # rel = idx + front - i*128 arithmetic goes negative and jnp.clip
    # silently maps real neighbors onto wrong band columns (ADVICE r2)
    assert tile <= 128 and 128 % tile == 0, (
        f"fused CRF requires tile <= 128 dividing 128, got {tile}"
    )
    tf = 128
    nt = -(-N // tf)
    front = _round_up(front0, 128)
    w = _round_up(front - front0 + max(tf - tile, 0) + width0, 128)
    npad = _round_up(max((nt - 1) * tf + w, front + nt * tf), 128)
    mpad = nt * tf - N

    idx_p = jnp.pad(idx, ((0, 0), (0, mpad), (0, 0)))
    w_p = jnp.pad(weights.astype(jnp.float32), ((0, 0), (0, mpad), (0, 0)))
    tile_off = (jnp.arange(nt, dtype=jnp.int32) * tf)[None, :, None, None]
    rel = jnp.clip(
        idx_p.reshape(B, nt, tf, K).astype(jnp.int32) + front - tile_off,
        0, w - 1,
    )
    relT = jnp.swapaxes(rel, 2, 3)                       # [B, nt, K, tf]
    wT = jnp.swapaxes(w_p.reshape(B, nt, tf, K), 2, 3)

    a_hi, a_lo = vma_pallas_call(
        functools.partial(_build_at_kernel, w=w, tile=tf, k_cols=K),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, K, tf), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, K, tf), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, w, tf), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, tf), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nt, w, tf), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, nt, w, tf), jnp.bfloat16),
        ],
        interpret=interpret,
    )(wT, relT)
    return a_hi, a_lo, tf, nt, front, w, npad


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

def _compat_products(c, H):
    """C = cᵀc, inv = (I+C)⁻¹, M = C·inv — the loop-invariant small
    matrices, at full f32 precision (differentiable XLA ops: the
    gradient into c flows through this chain outside crf_core)."""
    hpm = jax.lax.Precision.HIGHEST
    C = jnp.dot(c.T, c, precision=hpm).astype(jnp.float32)
    chol = jax.lax.linalg.cholesky(jnp.eye(H, dtype=jnp.float32) + C)
    inv_l = jax.lax.linalg.triangular_solve(
        chol, jnp.eye(H, dtype=jnp.float32), left_side=True, lower=True
    )
    inv = jnp.dot(inv_l.T, inv_l, precision=hpm)
    M = jnp.dot(C, inv, precision=hpm)
    return C, inv, M


def _to_t(a, front, npad, hp):
    """[B, N, H] → zero-padded transposed plane [B, hp, npad]."""
    B, N, H = a.shape
    buf = jnp.zeros((B, npad, hp), jnp.float32)
    buf = buf.at[:, front : front + N, :H].set(a.astype(jnp.float32))
    return jnp.swapaxes(buf, 1, 2)


def _from_t(aT, front, N, H):
    return jnp.swapaxes(aT, 1, 2)[:, front : front + N, :H]


@functools.partial(
    jax.jit, static_argnames=("steps", "tile", "pad", "interpret")
)
def crf_mean_field_windowed_fused(
    z: jnp.ndarray,
    s: jnp.ndarray,
    idx: jnp.ndarray,
    c: jnp.ndarray,
    steps: int,
    tile: int = 64,
    pad: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused windowed CRF mean field; same contract as crf_mean_field.

    Requires window-consistent same-scale indices (the pyramid from
    build_pyramid_windowed guarantees this; remove_self_loop preserves
    it).  Parity with the scan version is ~1e-4 relative (hi/lo bf16
    splits of both operands; f32 accumulation).  Differentiable: the
    VJP runs natively fused (crf_core).
    """
    H = z.shape[-1]
    if steps == 0:
        return z
    hpm = jax.lax.Precision.HIGHEST
    _, inv, M = _compat_products(c, H)
    zf = z.astype(jnp.float32)
    zp = jnp.einsum("bnh,hk->bnk", zf, inv, precision=hpm)
    out = crf_core(zf, zp, s, idx, M, steps, tile, pad, interpret)
    return out.astype(z.dtype)


def _run_core(z, zp, s, idx, M, steps, tile, pad, interpret, save_stack):
    """Dispatch the fused iterate kernel (optionally with the x-stack
    residual output for the native backward)."""
    B, N, H = z.shape
    a_hi, a_lo, tf, nt, front, w, npad = _banded_setup(
        s, idx, N, tile, pad, interpret
    )
    hp = max(_round_up(H, 8), 16)
    mt = jnp.zeros((hp, hp), jnp.float32).at[:H, :H].set(
        M.astype(jnp.float32).T
    )
    zT = _to_t(z, front, npad, hp)
    zpT = _to_t(zp, front, npad, hp)

    kw = dict(steps=steps, nt=nt, tile=tf, w=w, front=front, hp=hp,
              npad=npad)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),        # zT
        pl.BlockSpec(memory_space=pl.ANY),        # z'T
        pl.BlockSpec(memory_space=pl.ANY),        # A_hi
        pl.BlockSpec(memory_space=pl.ANY),        # A_lo
        pl.BlockSpec(
            (hp, hp), lambda b: (0, 0), memory_space=pltpu.VMEM
        ),                                        # Mᵀ
    ]
    scratch = [
        pltpu.VMEM((2, hp, npad), jnp.float32),      # x ping-pong
        pltpu.VMEM((hp, npad), jnp.float32),         # z' resident
        pltpu.VMEM((2, 2, w, tf), jnp.bfloat16),     # A double buffer
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA,
    ]
    if save_stack:
        out, stackT = vma_pallas_call(
            functools.partial(_iterate_stack_kernel, **kw),
            grid=(B,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, hp, npad), jnp.float32),
                jax.ShapeDtypeStruct((B, steps, hp, npad), jnp.float32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(zT, zpT, a_hi, a_lo, mt)
    else:
        out = vma_pallas_call(
            functools.partial(_iterate_kernel, **kw),
            grid=(B,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, hp, npad), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(zT, zpT, a_hi, a_lo, mt)
        stackT = None
    return _from_t(out, front, N, H), stackT


def _banded_geometry(N, H, tile, pad):
    """Pure kernel geometry (no arrays built)."""
    from crfconv_tpu.ops.windowed import window_starts

    _, width0, front0 = window_starts(N, N, tile, pad)
    tf = 128
    nt = -(-N // tf)
    front = _round_up(front0, 128)
    w = _round_up(front - front0 + max(tf - tile, 0) + width0, 128)
    npad = _round_up(max((nt - 1) * tf + w, front + nt * tf), 128)
    hp = max(_round_up(H, 8), 16)
    return tf, nt, front, w, npad, hp


def core_bwd_vmem_bytes(N, H, tile, pad):
    """VMEM upper bound for the backward recurrence kernel: 5 resident
    planes (λ ping-pong, u, dz', x_t) + the AT double buffer."""
    tf, nt, front, w, npad, hp = _banded_geometry(N, H, tile, pad)
    return 5 * hp * npad * 4 + 4 * tf * w * 2 + 2 * hp * hp * 4


def _core_scan(z, zp, s, idx, M, steps, tile, pad):
    """XLA reference/fallback for crf_core: the same linear iteration
    through windowed gathers (differentiable; used as the VJP when the
    backward kernel exceeds VMEM, and as the parity oracle in tests)."""
    from crfconv_tpu.ops.windowed import windowed_gather

    hpm = jax.lax.Precision.HIGHEST
    Mz = M.astype(z.dtype)

    def body(x, _):
        msg = windowed_gather(x, idx, tile, pad)
        msg = jnp.einsum("bnk,bnkh->bnh", s, msg, precision=hpm)
        return zp + jnp.dot(msg, Mz, precision=hpm), None

    x, _ = jax.lax.scan(body, z, None, length=steps)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def crf_core(z, zp, s, idx, M, steps, tile=64, pad=128, interpret=False):
    """x_steps of the linear iteration x ← z' + S̃(s, idx) x M, x_0 = z,
    fully fused on-chip.  Differentiable in z, z', s, M (idx gets no
    cotangent); the VJP is the native fused backward (reverse banded
    recurrence) when it fits VMEM, else the scan VJP."""
    out, _ = _run_core(
        z, zp, s, idx, M, steps, tile, pad, interpret, save_stack=False
    )
    return out


def _crf_core_fwd(z, zp, s, idx, M, steps, tile, pad, interpret):
    save = (
        core_bwd_vmem_bytes(z.shape[1], z.shape[2], tile, pad)
        <= 12 * 1024 * 1024
    )
    out, stackT = _run_core(
        z, zp, s, idx, M, steps, tile, pad, interpret, save_stack=save
    )
    return out, (z, zp, s, idx, M, stackT)


def _crf_core_bwd(steps, tile, pad, interpret, res, g):
    z, zp, s, idx, M, xstackT = res
    B, N, H = z.shape
    K = idx.shape[-1]
    if xstackT is None:
        # VMEM-bound fallback: differentiate the scan re-execution
        _, vjp = jax.vjp(
            lambda z_, zp_, s_, M_: _core_scan(
                z_, zp_, s_, idx, M_, steps, tile, pad
            ),
            z, zp, s, M,
        )
        dz, dzp, ds, dM = vjp(g)
        return dz, dzp, ds, None, dM

    at_hi, at_lo, tf, nt, front, w, npad = _banded_setup_rows(
        s, idx, N, tile, pad, interpret
    )
    hp = max(_round_up(H, 8), 16)
    m_pad = jnp.zeros((hp, hp), jnp.float32).at[:H, :H].set(
        M.astype(jnp.float32)
    )
    gT = _to_t(g, front, npad, hp)

    lstackT, dzT, dzpT, dm = vma_pallas_call(
        functools.partial(
            _bwd_iterate_kernel,
            steps=steps, nt=nt, w=w, front=front, hp=hp, npad=npad,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # gT
            pl.BlockSpec(memory_space=pl.ANY),    # x stack
            pl.BlockSpec(memory_space=pl.ANY),    # AT_hi
            pl.BlockSpec(memory_space=pl.ANY),    # AT_lo
            pl.BlockSpec(
                (hp, hp), lambda b: (0, 0), memory_space=pltpu.VMEM
            ),                                    # M
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # λ stack
            pl.BlockSpec(memory_space=pl.ANY),    # dzT
            pl.BlockSpec(memory_space=pl.ANY),    # dz'T
            pl.BlockSpec(
                (1, hp, hp), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),                                    # dM per batch
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, steps, hp, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, hp, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, hp, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, hp, hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, hp, npad), jnp.float32),    # λ ping-pong
            pltpu.VMEM((hp, npad), jnp.float32),       # u accumulator
            pltpu.VMEM((hp, npad), jnp.float32),       # dz' accumulator
            pltpu.VMEM((hp, npad), jnp.float32),       # x_t
            pltpu.VMEM((2, 2, tf, w), jnp.bfloat16),   # AT double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(gT, xstackT, at_hi, at_lo, m_pad)

    # ds: one banded neighbor-dot over the stacked (λ_{t+1}, x_t·M) planes
    hpm = jax.lax.Precision.HIGHEST
    mtp = jnp.zeros((hp, hp), jnp.float32).at[:H, :H].set(
        M.astype(jnp.float32).T
    )
    yT = jnp.einsum(
        "hk,btkn->bthn", mtp, xstackT, precision=hpm
    ).reshape(B, steps * hp, npad)
    lam_nd = jnp.transpose(lstackT, (0, 3, 1, 2)).reshape(
        B, npad, steps * hp
    )
    rel, *_ = _rel_row_blocks(idx, N, tile, pad)
    dsb = banded_neighbor_dot(
        lam_nd, yT, rel, front=front, w=w, interpret=interpret
    )
    ds = dsb.reshape(B, nt * tf, K)[:, :N].astype(s.dtype)

    dz = _from_t(dzT, front, N, H).astype(z.dtype)
    dzp = _from_t(dzpT, front, N, H).astype(zp.dtype)
    dM = jnp.sum(dm, axis=0)[:H, :H].astype(M.dtype)
    return dz, dzp, ds, None, dM


crf_core.defvjp(_crf_core_fwd, _crf_core_bwd)


# ---------------------------------------------------------------------------
# discrete CRF (CRF-as-RNN): q ← softmax(−u − (S̃_w q) C) fully on-chip
# ---------------------------------------------------------------------------

def _iterate_discrete_kernel(
    pT_ref, uT_ref, ahi_ref, alo_ref, ct_ref, out_ref,
    qbuf, ubuf, abuf, sem_init, sem_a, sem_out,
    *, steps, nt, tile, w, front, lp, npad,
):
    """Like _iterate_kernel, but the per-step apply is the CRF-as-RNN
    softmax update.  The unary uT rides padded with +1e30 in the rows
    beyond L so padded classes softmax to exactly 0."""
    b = pl.program_id(0)
    cp_p = pltpu.make_async_copy(pT_ref.at[b], qbuf.at[0], sem_init.at[0])
    cp_u = pltpu.make_async_copy(uT_ref.at[b], ubuf, sem_init.at[1])
    cp_p.start()
    cp_u.start()

    def a_copies(g, slot):
        j = jax.lax.rem(g, nt)
        return (
            pltpu.make_async_copy(
                ahi_ref.at[b, j], abuf.at[slot, 0], sem_a.at[slot, 0]
            ),
            pltpu.make_async_copy(
                alo_ref.at[b, j], abuf.at[slot, 1], sem_a.at[slot, 1]
            ),
        )

    h0, l0 = a_copies(0, 0)
    h0.start()
    l0.start()
    cp_p.wait()
    cp_u.wait()
    qbuf[1] = jnp.zeros((lp, npad), jnp.float32)   # finite halo (NaN·0 guard)
    ct = ct_ref[:]                                 # [lp, lp] f32 = Cᵀ padded

    total = steps * nt
    for t in range(steps):
        src, dst = t % 2, (t + 1) % 2

        def tile_body(i, carry, t=t, src=src, dst=dst):
            g = t * nt + i
            slot = jax.lax.rem(g, 2)

            @pl.when(g + 1 < total)
            def _():
                nh, nl = a_copies(g + 1, jax.lax.rem(g + 1, 2))
                nh.start()
                nl.start()

            ch, cl = a_copies(g, slot)
            ch.wait()
            cl.wait()

            r0 = pl.multiple_of(i * tile, 128)
            win = qbuf[src, :, pl.ds(r0, w)]        # [lp, w] f32
            whi = win.astype(jnp.bfloat16)
            wlo = (win - whi.astype(jnp.float32)).astype(jnp.bfloat16)
            ahi = abuf[slot, 0]
            alo = abuf[slot, 1]
            msg = (
                jnp.dot(whi, ahi, preferred_element_type=jnp.float32)
                + jnp.dot(wlo, ahi, preferred_element_type=jnp.float32)
                + jnp.dot(whi, alo, preferred_element_type=jnp.float32)
            )                                       # [lp, tile] msgᵀ
            o0 = pl.multiple_of(front + i * tile, 128)
            z = -ubuf[:, pl.ds(o0, tile)] - jnp.dot(
                ct, msg, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                       # padded rows → −1e30
            m = jnp.max(z, axis=0, keepdims=True)
            e = jnp.exp(z - m)
            qbuf[dst, :, pl.ds(o0, tile)] = e / jnp.sum(
                e, axis=0, keepdims=True
            )
            return carry

        jax.lax.fori_loop(0, nt, tile_body, 0)

    done = pltpu.make_async_copy(qbuf.at[steps % 2], out_ref.at[b], sem_out)
    done.start()
    done.wait()


def _iterate_discrete_stack_kernel(
    pT_ref, uT_ref, ahi_ref, alo_ref, ct_ref,
    out_ref, qstack_ref, msgstack_ref,
    qbuf, ubuf, abuf, sem_init, sem_a, sem_out, msgbuf,
    *, steps, nt, tile, w, front, lp, npad,
):
    """_iterate_discrete_kernel that additionally stores the post-step
    states q_{t+1} and the pre-compatibility messages msg_t = S̃ q_t to
    HBM (t = 0..steps-1) — the residuals the softmax VJP needs.  Stack
    copies are synchronous per step (~0.5 MB each, negligible next to
    the tile loop)."""
    b = pl.program_id(0)
    cp_p = pltpu.make_async_copy(pT_ref.at[b], qbuf.at[0], sem_init.at[0])
    cp_u = pltpu.make_async_copy(uT_ref.at[b], ubuf, sem_init.at[1])
    cp_p.start()
    cp_u.start()

    def a_copies(g, slot):
        j = jax.lax.rem(g, nt)
        return (
            pltpu.make_async_copy(
                ahi_ref.at[b, j], abuf.at[slot, 0], sem_a.at[slot, 0]
            ),
            pltpu.make_async_copy(
                alo_ref.at[b, j], abuf.at[slot, 1], sem_a.at[slot, 1]
            ),
        )

    h0, l0 = a_copies(0, 0)
    h0.start()
    l0.start()
    cp_p.wait()
    cp_u.wait()
    qbuf[1] = jnp.zeros((lp, npad), jnp.float32)   # finite halo (NaN·0 guard)
    msgbuf[:] = jnp.zeros((lp, npad), jnp.float32)
    ct = ct_ref[:]                                 # [lp, lp] f32 = Cᵀ padded

    total = steps * nt
    for t in range(steps):
        src, dst = t % 2, (t + 1) % 2

        def tile_body(i, carry, t=t, src=src, dst=dst):
            g = t * nt + i
            slot = jax.lax.rem(g, 2)

            @pl.when(g + 1 < total)
            def _():
                nh, nl = a_copies(g + 1, jax.lax.rem(g + 1, 2))
                nh.start()
                nl.start()

            ch, cl = a_copies(g, slot)
            ch.wait()
            cl.wait()

            r0 = pl.multiple_of(i * tile, 128)
            win = qbuf[src, :, pl.ds(r0, w)]        # [lp, w] f32
            whi = win.astype(jnp.bfloat16)
            wlo = (win - whi.astype(jnp.float32)).astype(jnp.bfloat16)
            ahi = abuf[slot, 0]
            alo = abuf[slot, 1]
            msg = (
                jnp.dot(whi, ahi, preferred_element_type=jnp.float32)
                + jnp.dot(wlo, ahi, preferred_element_type=jnp.float32)
                + jnp.dot(whi, alo, preferred_element_type=jnp.float32)
            )                                       # [lp, tile] msgᵀ
            o0 = pl.multiple_of(front + i * tile, 128)
            msgbuf[:, pl.ds(o0, tile)] = msg
            z = -ubuf[:, pl.ds(o0, tile)] - jnp.dot(
                ct, msg, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                       # padded rows → −1e30
            m = jnp.max(z, axis=0, keepdims=True)
            e = jnp.exp(z - m)
            qbuf[dst, :, pl.ds(o0, tile)] = e / jnp.sum(
                e, axis=0, keepdims=True
            )
            return carry

        jax.lax.fori_loop(0, nt, tile_body, 0)

        # q_{t+1} and msg_t are stable now (next step writes only the
        # other ping-pong slot / rewrites msgbuf after these complete)
        cp_q = pltpu.make_async_copy(
            qbuf.at[dst], qstack_ref.at[b, t], sem_out
        )
        cp_q.start()
        cp_q.wait()
        cp_m = pltpu.make_async_copy(msgbuf, msgstack_ref.at[b, t], sem_out)
        cp_m.start()
        cp_m.wait()

    done = pltpu.make_async_copy(qbuf.at[steps % 2], out_ref.at[b], sem_out)
    done.start()
    done.wait()


def _to_t_fill(a, front, npad, lp, fill):
    """[B, N, L] → transposed plane [B, lp, npad] padded with ``fill``.

    Rows outside [front, front+N) are never read through A; class rows
    beyond L must carry the fill so softmax zeroes them (fill=1e30 for
    the unary, 0 for probability planes)."""
    B, N, L = a.shape
    buf = jnp.full((B, npad, lp), fill, jnp.float32)
    buf = buf.at[:, front : front + N, :L].set(a.astype(jnp.float32))
    return jnp.swapaxes(buf, 1, 2)


def _run_discrete_core(p, unary, wgt, idx, compat, steps, tile, pad,
                       interpret, save_stack):
    """Dispatch the fused discrete iterate kernel (optionally saving the
    per-step q/message planes the softmax VJP needs)."""
    B, N, L = p.shape
    a_hi, a_lo, tf, nt, front, w, npad = _banded_setup(
        wgt, idx, N, tile, pad, interpret
    )
    lp = max(_round_up(L, 8), 16)
    ct = jnp.zeros((lp, lp), jnp.float32).at[:L, :L].set(
        compat.astype(jnp.float32).T
    )
    pT = _to_t_fill(p, front, npad, lp, 0.0)
    uT = _to_t_fill(unary, front, npad, lp, 1e30)

    kw = dict(steps=steps, nt=nt, tile=tf, w=w, front=front, lp=lp,
              npad=npad)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),           # pT (init q)
        pl.BlockSpec(memory_space=pl.ANY),           # uT
        pl.BlockSpec(memory_space=pl.ANY),           # A_hi
        pl.BlockSpec(memory_space=pl.ANY),           # A_lo
        pl.BlockSpec(
            (lp, lp), lambda b: (0, 0), memory_space=pltpu.VMEM
        ),                                           # Cᵀ
    ]
    scratch = [
        pltpu.VMEM((2, lp, npad), jnp.float32),      # q ping-pong
        pltpu.VMEM((lp, npad), jnp.float32),         # u resident
        pltpu.VMEM((2, 2, w, tf), jnp.bfloat16),     # A double buffer
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA,
    ]
    if save_stack:
        out, qstackT, msgstackT = vma_pallas_call(
            functools.partial(_iterate_discrete_stack_kernel, **kw),
            grid=(B,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, lp, npad), jnp.float32),
                jax.ShapeDtypeStruct((B, steps, lp, npad), jnp.float32),
                jax.ShapeDtypeStruct((B, steps, lp, npad), jnp.float32),
            ],
            scratch_shapes=scratch
            + [pltpu.VMEM((lp, npad), jnp.float32)],  # msg plane
            interpret=interpret,
        )(pT, uT, a_hi, a_lo, ct)
    else:
        out = vma_pallas_call(
            functools.partial(_iterate_discrete_kernel, **kw),
            grid=(B,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, lp, npad), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(pT, uT, a_hi, a_lo, ct)
        qstackT = msgstackT = None

    res = jnp.swapaxes(out, 1, 2)[:, front : front + N, :L]
    return res.astype(p.dtype), qstackT, msgstackT


@functools.partial(
    jax.jit, static_argnames=("steps", "tile", "pad", "interpret")
)
def discrete_crf_windowed_fused(
    p: jnp.ndarray,
    unary: jnp.ndarray,
    wgt: jnp.ndarray,
    idx: jnp.ndarray,
    compat: jnp.ndarray,
    steps: int,
    tile: int = 64,
    pad: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused windowed discrete CRF; same contract as discrete_crf_update
    with a pre-masked w.  The edge weights are loop-invariant, so the
    same banded-A machinery as the continuous kernel applies; only the
    per-step apply differs (softmax instead of the linear update).
    Differentiable in p, unary, wgt, compat (idx gets no cotangent);
    the VJP is the native fused reverse recurrence when it fits VMEM."""
    if steps == 0:
        return p
    return discrete_crf_core(
        p, unary, wgt, idx, compat, steps, tile, pad, interpret
    )


# ---------------------------------------------------------------------------
# training support: native fused backward (VERDICT r2 #1)
#
# The iteration x_{t+1} = z' + S̃ x_t M is LINEAR in x, so its VJP is the
# same banded machinery run in reverse:
#     λ_t  = (S̃ᵀ λ_{t+1}) Mᵀ           (reverse recurrence, λ_steps = g)
#     dz   = λ_0
#     dz'  = Σ_{t=1..steps} λ_t
#     dM   = Σ_t x_tᵀ (S̃ᵀ λ_{t+1})
#     ds[m,k] = Σ_t ⟨λ_{t+1}[m], (x_t M)[idx[m,k]]⟩
# S̃ᵀ restricted to a tile is the [tile, w] row-layout band block, so the
# reverse recurrence keeps λ resident in VMEM exactly like the forward
# keeps x; ds contracts the stacked (λ, x·M) planes with one banded
# neighbor-dot kernel (no [B,N,K,T·H] materialization).
# ---------------------------------------------------------------------------


def _rel_row_blocks(idx, N, tile, pad):
    """Banded relative indices in row layout [B, nt, 128, K] plus the
    kernel geometry (tf=128-row tiles, window width w, front, npad)."""
    from crfconv_tpu.ops.windowed import window_starts

    B, _, K = idx.shape
    starts0, width0, front0 = window_starts(N, N, tile, pad)
    assert tile <= 128 and 128 % tile == 0
    tf = 128
    nt = -(-N // tf)
    front = _round_up(front0, 128)
    w = _round_up(front - front0 + max(tf - tile, 0) + width0, 128)
    npad = _round_up(max((nt - 1) * tf + w, front + nt * tf), 128)
    mpad = nt * tf - N
    idx_p = jnp.pad(idx, ((0, 0), (0, mpad), (0, 0)))
    tile_off = (jnp.arange(nt, dtype=jnp.int32) * tf)[None, :, None, None]
    rel = jnp.clip(
        idx_p.reshape(B, nt, tf, K).astype(jnp.int32) + front - tile_off,
        0, w - 1,
    )
    return rel, tf, nt, front, w, npad


def _build_a_row_kernel(s_ref, rel_ref, ahi_ref, alo_ref, *, w, tile, k_cols):
    """Row-layout band blocks A_i [tile, w] (hi/lo bf16): row m holds
    s[m, k] at window column rel[m, k] (duplicates accumulate)."""
    s = s_ref[0, 0]          # [tile, K] f32
    rel = rel_ref[0, 0]      # [tile, K] int32
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1)
    acc = jnp.zeros((tile, w), jnp.float32)
    for k in range(k_cols):
        acc = acc + jnp.where(
            rel[:, k : k + 1] == iota_w, s[:, k : k + 1], 0.0
        )
    hi = acc.astype(jnp.bfloat16)
    ahi_ref[0, 0] = hi
    alo_ref[0, 0] = (acc - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _banded_setup_rows(weights, idx, N, tile, pad, interpret):
    """Row-layout sibling of _banded_setup (blocks [tile, w] instead of
    [w, tile]) for the backward band product u = S̃ᵀ λ."""
    B, _, K = idx.shape
    rel, tf, nt, front, w, npad = _rel_row_blocks(idx, N, tile, pad)
    mpad = nt * tf - N
    w_p = jnp.pad(
        weights.astype(jnp.float32), ((0, 0), (0, mpad), (0, 0))
    ).reshape(B, nt, tf, K)

    a_hi, a_lo = vma_pallas_call(
        functools.partial(_build_a_row_kernel, w=w, tile=tf, k_cols=K),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tf, K), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tf, K), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, tf, w), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tf, w), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nt, tf, w), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, nt, tf, w), jnp.bfloat16),
        ],
        interpret=interpret,
    )(w_p, rel)
    return a_hi, a_lo, tf, nt, front, w, npad


def _iterate_stack_kernel(
    zT_ref, zpT_ref, ahi_ref, alo_ref, mt_ref, out_ref, stack_ref,
    xbuf, zpbuf, abuf, sem_init, sem_a, sem_out,
    *, steps, nt, tile, w, front, hp, npad,
):
    """Forward iterate kernel that additionally stores the pre-step state
    x_t (t = 0..steps-1) to HBM — the residuals the linear VJP needs.
    The stack copy is synchronous per step (~1 MB, negligible next to
    the tile loop)."""
    b = pl.program_id(0)
    cp_z = pltpu.make_async_copy(zT_ref.at[b], xbuf.at[0], sem_init.at[0])
    cp_zp = pltpu.make_async_copy(zpT_ref.at[b], zpbuf, sem_init.at[1])
    cp_z.start()
    cp_zp.start()

    def a_copies(g, slot):
        j = jax.lax.rem(g, nt)
        return (
            pltpu.make_async_copy(
                ahi_ref.at[b, j], abuf.at[slot, 0], sem_a.at[slot, 0]
            ),
            pltpu.make_async_copy(
                alo_ref.at[b, j], abuf.at[slot, 1], sem_a.at[slot, 1]
            ),
        )

    h0, l0 = a_copies(0, 0)
    h0.start()
    l0.start()
    cp_z.wait()
    cp_zp.wait()
    xbuf[1] = jnp.zeros((hp, npad), jnp.float32)
    mt = mt_ref[:]

    total = steps * nt
    for t in range(steps):
        src, dst = t % 2, (t + 1) % 2
        # store x_t before it is consumed (xbuf[src] is stable during
        # step t: the step writes only into xbuf[dst])
        cp_s = pltpu.make_async_copy(
            xbuf.at[src], stack_ref.at[b, t], sem_out
        )
        cp_s.start()

        def tile_body(i, carry, t=t, src=src, dst=dst):
            g = t * nt + i
            slot = jax.lax.rem(g, 2)

            @pl.when(g + 1 < total)
            def _():
                nh, nl = a_copies(g + 1, jax.lax.rem(g + 1, 2))
                nh.start()
                nl.start()

            ch, cl = a_copies(g, slot)
            ch.wait()
            cl.wait()

            r0 = pl.multiple_of(i * tile, 128)
            win = xbuf[src, :, pl.ds(r0, w)]
            whi = win.astype(jnp.bfloat16)
            wlo = (win - whi.astype(jnp.float32)).astype(jnp.bfloat16)
            ahi = abuf[slot, 0]
            alo = abuf[slot, 1]
            msg = (
                jnp.dot(whi, ahi, preferred_element_type=jnp.float32)
                + jnp.dot(wlo, ahi, preferred_element_type=jnp.float32)
                + jnp.dot(whi, alo, preferred_element_type=jnp.float32)
            )
            o0 = pl.multiple_of(front + i * tile, 128)
            xnew = zpbuf[:, pl.ds(o0, tile)] + jnp.dot(
                mt, msg, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            xbuf[dst, :, pl.ds(o0, tile)] = xnew
            return carry

        jax.lax.fori_loop(0, nt, tile_body, 0)
        cp_s.wait()

    done = pltpu.make_async_copy(
        xbuf.at[steps % 2], out_ref.at[b], sem_out
    )
    done.start()
    done.wait()


def _bwd_iterate_kernel(
    gT_ref, xstackT_ref, athi_ref, atlo_ref, m_ref,
    lstackT_ref, dzT_ref, dzpT_ref, dm_ref,
    lbuf, ubuf, dzpbuf, xtbuf, atbuf, sem_init, sem_a, sem_io,
    *, steps, nt, w, front, hp, npad,
):
    """Reverse recurrence λ_t = (S̃ᵀ λ_{t+1}) Mᵀ with λ resident in VMEM.

    Per step: pass 1 accumulates u = S̃ᵀ λ (per tile, a [hp,128]×[128,w]
    band matmul overlap-added into the u plane), pass 2 applies M
    (λ_tT = M @ uT per tile), accumulates dM += x_tᵀ u_t and dz', and
    writes λ_t to the λ stack for the ds contraction."""
    tf = 128
    b = pl.program_id(0)
    cp_g = pltpu.make_async_copy(gT_ref.at[b], lbuf.at[0], sem_init.at[0])
    cp_g2 = pltpu.make_async_copy(gT_ref.at[b], dzpbuf, sem_init.at[1])
    cp_g.start()
    cp_g2.start()

    def at_copies(g, slot):
        j = jax.lax.rem(g, nt)
        return (
            pltpu.make_async_copy(
                athi_ref.at[b, j], atbuf.at[slot, 0], sem_a.at[slot, 0]
            ),
            pltpu.make_async_copy(
                atlo_ref.at[b, j], atbuf.at[slot, 1], sem_a.at[slot, 1]
            ),
        )

    h0, l0 = at_copies(0, 0)
    h0.start()
    l0.start()
    # x_{steps-1} for the first (t = steps-1) step
    cp_x = pltpu.make_async_copy(
        xstackT_ref.at[b, steps - 1], xtbuf, sem_io
    )
    cp_x.start()
    cp_g.wait()
    cp_g2.wait()
    # Λ[steps-1] = λ_steps = g (the ds contraction reads it from HBM)
    cp_gs = pltpu.make_async_copy(
        gT_ref.at[b], lstackT_ref.at[b, steps - 1], sem_init.at[0]
    )
    cp_gs.start()
    lbuf[1] = jnp.zeros((hp, npad), jnp.float32)   # finite halo
    m = m_ref[:]                                   # [hp, hp] = M padded
    dm_ref[0] = jnp.zeros((hp, hp), jnp.float32)
    cp_gs.wait()
    cp_x.wait()

    total = steps * nt
    for ti, t in enumerate(range(steps - 1, -1, -1)):
        src, dst = ti % 2, (ti + 1) % 2
        ubuf[:] = jnp.zeros((hp, npad), jnp.float32)

        def tile_body(i, carry, ti=ti, src=src):
            g = ti * nt + i
            slot = jax.lax.rem(g, 2)

            @pl.when(g + 1 < total)
            def _():
                nh, nl = at_copies(g + 1, jax.lax.rem(g + 1, 2))
                nh.start()
                nl.start()

            ch, cl = at_copies(g, slot)
            ch.wait()
            cl.wait()

            o0 = pl.multiple_of(front + i * tf, 128)
            lt = lbuf[src, :, pl.ds(o0, tf)]       # [hp, tf] f32
            lhi = lt.astype(jnp.bfloat16)
            llo = (lt - lhi.astype(jnp.float32)).astype(jnp.bfloat16)
            at_hi = atbuf[slot, 0]                 # [tf, w] bf16
            at_lo = atbuf[slot, 1]
            contrib = (
                jnp.dot(lhi, at_hi, preferred_element_type=jnp.float32)
                + jnp.dot(llo, at_hi, preferred_element_type=jnp.float32)
                + jnp.dot(lhi, at_lo, preferred_element_type=jnp.float32)
            )                                      # [hp, w]
            r0 = pl.multiple_of(i * tf, 128)
            ubuf[:, pl.ds(r0, w)] = ubuf[:, pl.ds(r0, w)] + contrib
            return carry

        jax.lax.fori_loop(0, nt, tile_body, 0)

        def tile_body2(i, carry, t=t, dst=dst):
            o0 = pl.multiple_of(front + i * tf, 128)
            ut = ubuf[:, pl.ds(o0, tf)]            # [hp, tf]
            lt_new = jnp.dot(
                m, ut, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            lbuf[dst, :, pl.ds(o0, tf)] = lt_new

            @pl.when(t >= 1)
            def _():
                dzpbuf[:, pl.ds(o0, tf)] = (
                    dzpbuf[:, pl.ds(o0, tf)] + lt_new
                )

            xt = xtbuf[:, pl.ds(o0, tf)]           # [hp, tf]
            dm_ref[0] = dm_ref[0] + jax.lax.dot_general(
                xt, ut, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return carry

        jax.lax.fori_loop(0, nt, tile_body2, 0)

        # Λ[t-1] = λ_t for the ds contraction (sync copy; the buffer is
        # rewritten two steps later, well after this completes)
        @pl.when(t >= 1)
        def _():
            cp_l = pltpu.make_async_copy(
                lbuf.at[dst], lstackT_ref.at[b, t - 1], sem_io
            )
            cp_l.start()
            cp_l.wait()

        # prefetch x_{t-1} (xtbuf free: pass 2 of this step is done)
        @pl.when(t >= 1)
        def _():
            cp_xn = pltpu.make_async_copy(
                xstackT_ref.at[b, t - 1], xtbuf, sem_io
            )
            cp_xn.start()
            cp_xn.wait()

    final = steps % 2
    cp_dz = pltpu.make_async_copy(lbuf.at[final], dzT_ref.at[b], sem_io)
    cp_dz.start()
    cp_dz.wait()
    cp_dzp = pltpu.make_async_copy(dzpbuf, dzpT_ref.at[b], sem_io)
    cp_dzp.start()
    cp_dzp.wait()


def _nbr_dot_kernel(
    a_ref, bT_ref, rel_ref, out_ref, win_ref, sem,
    *, w, k_cols, d,
):
    """Banded neighbor dot: out[m, k] = ⟨a[m], b[idx[m, k]]⟩ over D
    features, per 128-row tile.  G = A_tile @ B_winᵀ is one MXU matmul
    (hi/lo bf16 split of both operands); the K columns are then
    extracted with iota-compare row reductions."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    tf = 128
    copy = pltpu.make_async_copy(
        bT_ref.at[b, :, pl.ds(i * tf, w)], win_ref, sem
    )
    copy.start()
    a = a_ref[0]                                   # [tf, D] f32
    ahi = a.astype(jnp.bfloat16)
    alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
    copy.wait()
    win = win_ref[:]                               # [D, w] f32
    whi = win.astype(jnp.bfloat16)
    wlo = (win - whi.astype(jnp.float32)).astype(jnp.bfloat16)
    G = (
        jnp.dot(ahi, whi, preferred_element_type=jnp.float32)
        + jnp.dot(alo, whi, preferred_element_type=jnp.float32)
        + jnp.dot(ahi, wlo, preferred_element_type=jnp.float32)
    )                                              # [tf, w]
    rel = rel_ref[0, 0]                            # [tf, K] int32
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (tf, w), 1)
    cols = []
    for k in range(k_cols):
        sel = jnp.where(rel[:, k : k + 1] == iota_w, G, 0.0)
        cols.append(jnp.sum(sel, axis=1, keepdims=True))
    out_ref[0, 0] = jnp.concatenate(cols, axis=1)


def banded_neighbor_dot(
    a_nd: jnp.ndarray,
    b_td: jnp.ndarray,
    rel: jnp.ndarray,
    *,
    front: int,
    w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[b, i, m, k] = ⟨a_nd[b, front + i·128 + m], b_td[b, :, rel]⟩.

    a_nd: [B, npad, D] query-major stacked features.
    b_td: [B, D, npad] source-major (transposed) stacked features.
    rel:  [B, nt, 128, K] window-relative indices (from _rel_row_blocks).
    """
    B, nt, tf, K = rel.shape
    D = a_nd.shape[-1]
    return vma_pallas_call(
        functools.partial(_nbr_dot_kernel, w=w, k_cols=K, d=D),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, tf, D), lambda b, i: (b, front // 128 + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),     # b_td in HBM
            pl.BlockSpec(
                (1, 1, tf, K), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tf, K), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt, tf, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(a_nd, b_td, rel)


# ---------------------------------------------------------------------------
# discrete CRF: native fused backward
#
# Per forward step: msg_t = S̃ q_t,  z_t = −u − msg_t C,  q_{t+1} = softmax(z_t).
# Reverse-mode with λ_t = ∂L/∂q_t (λ_S = g):
#     dz_t   = q_{t+1} ⊙ (λ_{t+1} − Σ_l λ_{t+1} q_{t+1})    (softmax VJP)
#     du    −= dz_t
#     dC    −= msg_tᵀ dz_t
#     dmsg_t = −dz_t Cᵀ
#     λ_t    = S̃ᵀ dmsg_t                                     (banded, like
#                                                             the continuous λ)
#     dw[m,k] = Σ_t ⟨dmsg_t[m], q_t[idx[m,k]]⟩               (banded nbr-dot)
#     dp     = λ_0
# The forward saves the q_{t+1}/msg_t planes; everything else is the same
# VMEM-resident machinery as the continuous backward (λ ping-pong, row-
# layout Aᵀ streaming, one neighbor-dot for dw).
# ---------------------------------------------------------------------------


def _bwd_discrete_kernel(
    gT_ref, qstackT_ref, msgstackT_ref, athi_ref, atlo_ref, c_ref,
    dmsgstackT_ref, dpT_ref, duT_ref, dc_ref,
    lbuf, dubuf, dmsgbuf, qnbuf, msgbuf, atbuf, sem_init, sem_a, sem_io,
    *, steps, nt, w, front, lp, npad,
):
    """Reverse discrete recurrence with λ resident in VMEM.

    Per reverse step: pass A (elementwise per tile) computes the softmax
    VJP dz, accumulates du and dC, and forms dmsg = −C dzT; pass B
    overlap-adds λ_t = S̃ᵀ dmsg via the row-layout band blocks."""
    tf = 128
    b = pl.program_id(0)
    cp_g = pltpu.make_async_copy(gT_ref.at[b], lbuf.at[0], sem_init.at[0])
    cp_g.start()

    def at_copies(g, slot):
        j = jax.lax.rem(g, nt)
        return (
            pltpu.make_async_copy(
                athi_ref.at[b, j], atbuf.at[slot, 0], sem_a.at[slot, 0]
            ),
            pltpu.make_async_copy(
                atlo_ref.at[b, j], atbuf.at[slot, 1], sem_a.at[slot, 1]
            ),
        )

    h0, l0 = at_copies(0, 0)
    h0.start()
    l0.start()
    # q_steps / msg_{steps-1} for the first (t = steps-1) reverse step
    cp_q = pltpu.make_async_copy(
        qstackT_ref.at[b, steps - 1], qnbuf, sem_init.at[1]
    )
    cp_q.start()
    cp_m = pltpu.make_async_copy(
        msgstackT_ref.at[b, steps - 1], msgbuf, sem_io
    )
    cp_m.start()
    dubuf[:] = jnp.zeros((lp, npad), jnp.float32)
    dmsgbuf[:] = jnp.zeros((lp, npad), jnp.float32)  # finite halo for stack
    dc_ref[0] = jnp.zeros((lp, lp), jnp.float32)
    c = c_ref[:]                                     # [lp, lp] f32 = C padded
    cp_g.wait()
    cp_q.wait()
    cp_m.wait()

    total = steps * nt
    for ti, t in enumerate(range(steps - 1, -1, -1)):
        src, dst = ti % 2, (ti + 1) % 2

        def tile_a(i, carry, src=src):
            o0 = pl.multiple_of(front + i * tf, 128)
            lam = lbuf[src, :, pl.ds(o0, tf)]        # [lp, tf] λ_{t+1}
            qn = qnbuf[:, pl.ds(o0, tf)]             # [lp, tf] q_{t+1}
            col = jnp.sum(lam * qn, axis=0, keepdims=True)
            dz = qn * (lam - col)                    # softmax VJP
            dubuf[:, pl.ds(o0, tf)] = dubuf[:, pl.ds(o0, tf)] + dz
            dmsgbuf[:, pl.ds(o0, tf)] = -jnp.dot(
                c, dz, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            # dC accumulator (sign applied by the host): Σ_n msg[n,i]dz[n,j]
            dc_ref[0] = dc_ref[0] + jax.lax.dot_general(
                msgbuf[:, pl.ds(o0, tf)], dz, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return carry

        jax.lax.fori_loop(0, nt, tile_a, 0)

        # dmsg_t plane to HBM for the dw neighbor-dot (sync: the buffer
        # is rewritten only in the next step's pass A, after this)
        cp_dm = pltpu.make_async_copy(
            dmsgbuf, dmsgstackT_ref.at[b, t], sem_io
        )
        cp_dm.start()
        cp_dm.wait()

        # prefetch q_t / msg_{t-1} for the next reverse step (pass B does
        # not read qnbuf/msgbuf; sync like the continuous stack loads)
        @pl.when(t >= 1)
        def _():
            cp_qn = pltpu.make_async_copy(
                qstackT_ref.at[b, t - 1], qnbuf, sem_init.at[1]
            )
            cp_qn.start()
            cp_qn.wait()
            cp_mn = pltpu.make_async_copy(
                msgstackT_ref.at[b, t - 1], msgbuf, sem_io
            )
            cp_mn.start()
            cp_mn.wait()

        lbuf[dst] = jnp.zeros((lp, npad), jnp.float32)

        def tile_b(i, carry, ti=ti, dst=dst):
            g = ti * nt + i
            slot = jax.lax.rem(g, 2)

            @pl.when(g + 1 < total)
            def _():
                nh, nl = at_copies(g + 1, jax.lax.rem(g + 1, 2))
                nh.start()
                nl.start()

            ch, cl = at_copies(g, slot)
            ch.wait()
            cl.wait()

            o0 = pl.multiple_of(front + i * tf, 128)
            dm_t = dmsgbuf[:, pl.ds(o0, tf)]         # [lp, tf]
            dhi = dm_t.astype(jnp.bfloat16)
            dlo = (dm_t - dhi.astype(jnp.float32)).astype(jnp.bfloat16)
            at_hi = atbuf[slot, 0]                   # [tf, w] bf16
            at_lo = atbuf[slot, 1]
            contrib = (
                jnp.dot(dhi, at_hi, preferred_element_type=jnp.float32)
                + jnp.dot(dlo, at_hi, preferred_element_type=jnp.float32)
                + jnp.dot(dhi, at_lo, preferred_element_type=jnp.float32)
            )                                        # [lp, w]
            r0 = pl.multiple_of(i * tf, 128)
            lbuf[dst, :, pl.ds(r0, w)] = lbuf[dst, :, pl.ds(r0, w)] + contrib
            return carry

        jax.lax.fori_loop(0, nt, tile_b, 0)

    final = steps % 2
    cp_dp = pltpu.make_async_copy(lbuf.at[final], dpT_ref.at[b], sem_io)
    cp_dp.start()
    cp_dp.wait()
    cp_du = pltpu.make_async_copy(dubuf, duT_ref.at[b], sem_io)
    cp_du.start()
    cp_du.wait()


def discrete_bwd_vmem_bytes(N, L, tile, pad):
    """VMEM upper bound for the discrete backward kernel: 6 resident
    planes (λ ping-pong, du, dmsg, q_{t+1}, msg_t) + the Aᵀ double
    buffer.  The stack-saving forward needs one plane fewer."""
    tf, nt, front, w, npad, _ = _banded_geometry(N, L, tile, pad)
    lp = max(_round_up(L, 8), 16)
    return 6 * lp * npad * 4 + 4 * tf * w * 2 + 2 * lp * lp * 4


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def discrete_crf_core(p, unary, wgt, idx, compat, steps, tile=64,
                      pad=128, interpret=False):
    """steps of q ← softmax(−u − (S̃ q) C), fully fused on-chip.
    Differentiable in p, unary, wgt, compat (idx gets no cotangent);
    the VJP is the native fused reverse recurrence when it fits VMEM,
    else the scan VJP."""
    out, _, _ = _run_discrete_core(
        p, unary, wgt, idx, compat, steps, tile, pad, interpret,
        save_stack=False,
    )
    return out


def _discrete_core_fwd(p, unary, wgt, idx, compat, steps, tile, pad,
                       interpret):
    save = (
        discrete_bwd_vmem_bytes(p.shape[1], p.shape[2], tile, pad)
        <= 12 * 1024 * 1024
    )
    out, qstackT, msgstackT = _run_discrete_core(
        p, unary, wgt, idx, compat, steps, tile, pad, interpret,
        save_stack=save,
    )
    return out, (p, unary, wgt, idx, compat, qstackT, msgstackT)


def _discrete_core_bwd(steps, tile, pad, interpret, res, g):
    p, unary, wgt, idx, compat, qstackT, msgstackT = res
    B, N, L = p.shape
    K = idx.shape[-1]
    if qstackT is None:
        # VMEM-bound fallback: differentiate the scan re-execution
        from crfconv_tpu.ops.crf import _discrete_scan

        _, vjp = jax.vjp(
            lambda p_, u_, w_, c_: _discrete_scan(
                p_, u_, w_, idx, c_, steps
            ),
            p, unary, wgt, compat,
        )
        dp, du, dw, dc = vjp(g)
        return dp, du, dw, None, dc

    at_hi, at_lo, tf, nt, front, w, npad = _banded_setup_rows(
        wgt, idx, N, tile, pad, interpret
    )
    lp = max(_round_up(L, 8), 16)
    c_pad = jnp.zeros((lp, lp), jnp.float32).at[:L, :L].set(
        compat.astype(jnp.float32)
    )
    gT = _to_t_fill(g, front, npad, lp, 0.0)

    dmsgstackT, dpT, duT, dc = vma_pallas_call(
        functools.partial(
            _bwd_discrete_kernel,
            steps=steps, nt=nt, w=w, front=front, lp=lp, npad=npad,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # gT
            pl.BlockSpec(memory_space=pl.ANY),    # q stack
            pl.BlockSpec(memory_space=pl.ANY),    # msg stack
            pl.BlockSpec(memory_space=pl.ANY),    # AT_hi
            pl.BlockSpec(memory_space=pl.ANY),    # AT_lo
            pl.BlockSpec(
                (lp, lp), lambda b: (0, 0), memory_space=pltpu.VMEM
            ),                                    # C
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # dmsg stack
            pl.BlockSpec(memory_space=pl.ANY),    # dpT
            pl.BlockSpec(memory_space=pl.ANY),    # duT
            pl.BlockSpec(
                (1, lp, lp), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),                                    # dC per batch
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, steps, lp, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, lp, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, lp, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, lp, lp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, lp, npad), jnp.float32),    # λ ping-pong
            pltpu.VMEM((lp, npad), jnp.float32),       # du accumulator
            pltpu.VMEM((lp, npad), jnp.float32),       # dmsg plane
            pltpu.VMEM((lp, npad), jnp.float32),       # q_{t+1}
            pltpu.VMEM((lp, npad), jnp.float32),       # msg_t
            pltpu.VMEM((2, 2, tf, w), jnp.bfloat16),   # Aᵀ double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(gT, qstackT, msgstackT, at_hi, at_lo, c_pad)

    # dw: one banded neighbor-dot over the stacked (dmsg_t, q_t) planes,
    # q_t = (p, q_1..q_{steps-1})
    pT = _to_t_fill(p, front, npad, lp, 0.0)
    qprevT = jnp.concatenate(
        [pT[:, None], qstackT[:, : steps - 1]], axis=1
    )                                              # [B, steps, lp, npad]
    dmsg_nd = jnp.transpose(dmsgstackT, (0, 3, 1, 2)).reshape(
        B, npad, steps * lp
    )
    rel, *_ = _rel_row_blocks(idx, N, tile, pad)
    dwb = banded_neighbor_dot(
        dmsg_nd, qprevT.reshape(B, steps * lp, npad), rel,
        front=front, w=w, interpret=interpret,
    )
    dw = dwb.reshape(B, nt * tf, K)[:, :N].astype(wgt.dtype)

    dp = _from_t(dpT, front, N, L).astype(p.dtype)
    du = -_from_t(duT, front, N, L).astype(unary.dtype)
    dc = -jnp.sum(dc, axis=0)[:L, :L].astype(compat.dtype)
    return dp, du, dw, None, dc


discrete_crf_core.defvjp(_discrete_core_fwd, _discrete_core_bwd)
