"""Continuous / discrete Gaussian CRF mean-field math on dense neighborhoods.

The continuous CRF decoder replaces plain upsampling in the segmentation
U-Net: given unary features z (from the coarse scale) and a Gaussian
similarity s over K spatial neighbors, it runs the closed-form mean-field
iteration

    x <- ( z + (S x) C ) (I + C)^{-1}

with a learned PSD compatibility C = cᵀc.  This is the reference math at
models/continuous_crf_conv_big.py:63-72 (dense) and
models/continuous_crf_conv.py:59-67 (edge-list), re-expressed with
static-shape gathers so the whole loop is one fused XLA/Pallas region.

(I + C)^{-1} is loop-invariant and tiny (H ≤ 128): it is computed once
per call, outside the iteration (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from crfconv_tpu.ops.neighbors import gather_neighbors, masked_softmax


def gaussian_similarity(
    y: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    neighbors: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-neighbor Gaussian affinity softmax_K(-‖y_i - y_j‖²).

    Reference: models/continuous_crf_conv_big.py:49-54.

    Args:
      y:            [B, N, H] pairwise (guidance) features.
      neighbor_idx: [B, N, K] int32 neighbor indices (self already removed).
      mask:         optional [B, N, K] bool neighbor validity.
      neighbors:    optional pre-gathered y neighbors [B, N, K, H].

    Returns:
      s: [B, N, K] affinities, each row summing to 1 (or 0 if fully masked).
    """
    if neighbors is None:
        neighbors = gather_neighbors(y, neighbor_idx)        # [B, N, K, H]
    d = y[:, :, None, :] - neighbors                          # [B, N, K, H]
    d = jnp.sum(d * d, axis=-1)                               # [B, N, K]
    return masked_softmax(-d, mask, axis=2)


def _spd_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a small SPD matrix via Cholesky (≥f32, MXU-irrelevant)."""
    m = m.astype(jnp.promote_types(m.dtype, jnp.float32))
    chol = jax.lax.linalg.cholesky(m)
    eye = jnp.eye(m.shape[-1], dtype=m.dtype)
    inv_l = jax.lax.linalg.triangular_solve(
        chol, eye, left_side=True, lower=True
    )
    return jnp.dot(inv_l.T, inv_l, precision=jax.lax.Precision.HIGHEST)


def _crf_scan(
    z: jnp.ndarray,
    s: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    c: jnp.ndarray,
    steps: int,
    neighbors0: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    msg0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """XLA lax.scan implementation of the mean-field loop (reference
    math, one gather per step).  Differentiable; also serves as the
    backward path of the fused kernel.  ``x0`` restarts the recurrence
    from a prior state (chunked halo exchange, parallel/spatial.py);
    the per-step unary stays z.  ``msg0`` is the PRE-REDUCED first
    message Σ_k s·z_k (from the fused similarity kernel,
    ops/crf_sim_pallas.py) — the first step then needs no gather and no
    K-reduction at all."""
    h = z.shape[-1]
    C = jnp.dot(c.T, c, precision=jax.lax.Precision.HIGHEST)
    inv = _spd_inverse(jnp.eye(h, dtype=C.dtype) + C)
    C = C.astype(z.dtype)
    inv = inv.astype(z.dtype)

    # The compatibility matmuls are [*, H]·[H, H] with H ≤ 128 — negligible
    # FLOPs, so run them at full f32 precision (the platform default would
    # drop to bf16 MXU passes and break parity with the reference).
    hp = jax.lax.Precision.HIGHEST

    def apply(msg):
        x = z + jnp.dot(msg, C, precision=hp)                 # compatibility
        return jnp.dot(x, inv, precision=hp)                  # normalization

    def update(x, neigh):
        msg = jnp.einsum("bnk,bnkh->bnh", s, neigh, precision=hp)
        return apply(msg)

    def body(x, _):
        return update(x, gather_neighbors(x, neighbor_idx)), None

    x = z if x0 is None else x0
    remaining = steps
    if msg0 is not None and steps > 0:
        x = apply(msg0.astype(z.dtype))
        remaining = steps - 1
    elif neighbors0 is not None and steps > 0:
        x = update(x, neighbors0)
        remaining = steps - 1
    x, _ = jax.lax.scan(body, x, None, length=remaining)
    return x


# ---------------------------------------------------------------------------
# fused Pallas path (windowed regime): forward = on-chip iterate kernel;
# backward = the NATIVE fused reverse recurrence (crf_pallas.crf_core's
# custom VJP — the iteration is linear, so its transpose is the same
# banded-matmul loop run with S̃ᵀ).  The small-matrix chain into c
# (C = cᵀc, (I+C)⁻¹, M) stays ordinary differentiable XLA.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("steps", "tile", "pad"))
def _crf_fused(z, s, neighbor_idx, c, steps, tile, pad, x0=None):
    from crfconv_tpu.ops.crf_pallas import _compat_products, crf_core

    h = z.shape[-1]
    _, inv, M = _compat_products(c, h)
    zf = z.astype(jnp.float32)
    zp = jnp.einsum(
        "bnh,hk->bnk", zf, inv, precision=jax.lax.Precision.HIGHEST
    )
    # crf_core's first operand is the INITIAL state (x_0), zp the
    # loop-invariant unary term — restartable by construction
    start = zf if x0 is None else x0.astype(jnp.float32)
    out = crf_core(start, zp, s, neighbor_idx, M, steps, tile, pad, False)
    return out.astype(z.dtype)


_crf_scan_jit = jax.jit(_crf_scan, static_argnames=("steps",))


def _fused_vmem_bytes(n: int, h: int, tile: int, pad: int) -> int:
    """Upper-bound VMEM estimate for the fused iterate kernels.

    Mirrors the geometry of crf_pallas._banded_setup without building
    anything: the resident planes are the state ping-pong (2×) plus the
    loop-invariant plane (z' or u), each [hp, npad] f32, plus the A
    double buffer (2 slots × hi/lo × [w, 128] bf16)."""
    from crfconv_tpu.ops.windowed import window_starts

    _, width0, front0 = window_starts(n, n, tile, pad)
    front = -(-front0 // 128) * 128
    nt = -(-n // 128)
    w = -(-(front - front0 + max(128 - tile, 0) + width0) // 128) * 128
    npad = -(-max((nt - 1) * 128 + w, front + nt * 128) // 128) * 128
    hp = max(-(-h // 8) * 8, 16)
    return 3 * hp * npad * 4 + 4 * w * 128 * 2 + hp * hp * 4


def _fused_ok(
    n: int, h: int, steps: int, mode: dict, b: int = 1
) -> bool:
    import os

    """Dispatch guard for the fused Pallas CRF kernels: windowed mode on
    TPU, ≥2 steps (one step has no HBM round-trip to save), a pyramid
    tile the 128-row kernel tiles can cover exactly (ADVICE r2: tiles
    straddling kernel tiles silently corrupt the banded indices), and a
    VMEM budget check (ADVICE r2: Mosaic would otherwise fail at compile
    time instead of falling back to the scan)."""
    # Kill switch (known issue, r5): the small-family steps=10 TRAIN
    # programs (CRFSegNet/CRFSegNet_Part shapes) die in the remote
    # Mosaic compile with a scoped-vmem STACK overflow that the
    # resident-buffer model below cannot see, while the same models'
    # INFERENCE programs compile and run fused.  Until the stack model
    # is understood, CRFCONV_CRF_FUSED=0 routes the whole CRF to the
    # (differentiable, parity-tested) scan path; benchmarks set it for
    # exactly those train rows.
    if os.environ.get("CRFCONV_CRF_FUSED") == "0":
        return False
    return (
        steps >= 2
        and mode["mode"] == "windowed"
        and jax.default_backend() == "tpu"
        and mode["tile"] <= 128
        and 128 % mode["tile"] == 0
        # 13.5 MB: the Semantic3D scale-0 shape (N=65536, hp=16,
        # 12.7 MB) is probed-good on v5e; the next realistic tier up
        # (hp=32 at that N, 25 MB) cannot fit
        and _fused_vmem_bytes(n, h, mode["tile"], mode["pad"])
        <= int(13.5 * 1024 * 1024)
    )


def crf_mean_field(
    z: jnp.ndarray,
    s: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    c: jnp.ndarray,
    steps: int = 1,
    neighbors0: Optional[jnp.ndarray] = None,
    allow_fused: bool = False,
    x0: Optional[jnp.ndarray] = None,
    msg0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run ``steps`` mean-field iterations of the continuous Gaussian CRF.

    This is an UNJITTED dispatcher: it reads the neighbor-mode global and
    passes the choice to jitted inner functions as static structure, so a
    mode switch between calls always retraces (ADVICE r2: a jitted
    dispatcher cached the fused trace under a key that did not include
    the mode, silently corrupting exact-mode calls after a windowed one).

    Args:
      z:            [B, N, H] unary features (initial state).
      s:            [B, N, K] neighbor affinities (rows sum to ≤ 1).
      neighbor_idx: [B, N, K] int32 neighbor indices.
      c:            [H, H] unconstrained compatibility parameter; the PSD
                    compatibility used is C = cᵀ c (reference
                    continuous_crf_conv_big.py:66).
      steps:        number of mean-field iterations (static).
      neighbors0:   optional pre-gathered neighbors of the INITIAL state z
                    ([B, N, K, H]).  Callers that already gather other
                    tensors with the same indices can ride z along and
                    skip this function's first gather (gather cost on TPU
                    is index-count-bound, so fusing gathers is free).
      allow_fused:  permit dispatch to the fused Pallas kernel.  Taken in
                    the windowed regime on TPU at steps ≥ 2 (where the
                    scan pays one HBM round-trip per step) when the
                    geometry/VMEM guards pass.

    Returns:
      x: [B, N, H] refined features.
    """
    from crfconv_tpu.ops.neighbors import get_neighbor_mode
    from crfconv_tpu.ops import spatial_state

    if spatial_state.current() is not None:
        # point-sharded forward: chunked halo iteration on the local span
        from crfconv_tpu.parallel.spatial_forward import crf_mean_field_ctx

        return crf_mean_field_ctx(
            z, s, neighbor_idx, c, steps, neighbors0, allow_fused
        )

    mode = get_neighbor_mode()
    if allow_fused and _fused_ok(
        z.shape[1], z.shape[2], steps, mode, z.shape[0]
    ):
        # the fused core re-derives every message from the banded A
        # built out of s; a precomputed msg0 is unused there
        return _crf_fused(
            z, s, neighbor_idx, c, steps, mode["tile"], mode["pad"], x0
        )
    return _crf_scan_jit(
        z, s, neighbor_idx, c, steps, neighbors0, x0, msg0
    )


def discrete_crf_update(
    p: jnp.ndarray,
    unary: jnp.ndarray,
    w: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    compat: jnp.ndarray,
    steps: int = 5,
    mask: Optional[jnp.ndarray] = None,
    allow_fused: bool = False,
) -> jnp.ndarray:
    """Discrete CRF-as-RNN mean field over class probabilities.

    Reference math (models/discrete_crf_conv.py:57-62):
        q <- softmax( -u - (Σ_j w_ij q_j) C )
    with u = -log p and edge weights w from learned Gaussian kernels.

    Args:
      p:            [B, N, L] initial class probabilities.
      unary:        [B, N, L] unary potentials u = -log p.
      w:            [B, N, K] edge weights (Gaussian kernel mixture).
      neighbor_idx: [B, N, K] int32.
      compat:       [L, L] label compatibility matrix.
      steps:        mean-field iterations.
      mask:         optional [B, N, K] neighbor validity.

    Returns:
      q: [B, N, L] refined probabilities.
    """
    if mask is not None:
        w = jnp.where(mask, w, 0.0)

    from crfconv_tpu.ops.neighbors import get_neighbor_mode
    from crfconv_tpu.ops import spatial_state

    if spatial_state.current() is not None:
        ctx = spatial_state.current()
        fr = ctx["frames"].get(p.shape[1])
        if fr is not None and fr[0]:
            # point-sharded: chunked halo iteration on the local span
            from crfconv_tpu.parallel.spatial import (
                _discrete_local_chunks,
                _halo_rows,
            )

            mode = get_neighbor_mode()
            tile, pad = mode["tile"], mode["pad"]
            local = p.shape[1]
            j = steps
            while j > 1 and 2 * _halo_rows(j, tile, pad) >= local:
                j -= 1
            h = _halo_rows(j, tile, pad)
            assert h <= local, (
                f"spatial discrete-CRF halo {h} exceeds local span {local}"
            )
            return _discrete_local_chunks(
                p, unary, w, neighbor_idx, compat, steps=steps, j=j, h=h,
                local=local, axis=ctx["axis"], allow_fused=allow_fused,
            )
        with spatial_state.suspend():
            return discrete_crf_update(
                p, unary, w, neighbor_idx, compat, steps=steps,
                allow_fused=allow_fused,
            )

    mode = get_neighbor_mode()
    if allow_fused and _fused_ok(p.shape[1], p.shape[2], steps, mode):
        # edge weights are loop-invariant, so the same banded-A fusion as
        # the continuous kernel applies; differentiable (native fused
        # reverse recurrence with the per-step softmax VJP — see
        # crf_pallas.discrete_crf_core), so training runs fused too
        from crfconv_tpu.ops.crf_pallas import discrete_crf_windowed_fused

        return discrete_crf_windowed_fused(
            p, unary, w, neighbor_idx, compat, steps,
            mode["tile"], mode["pad"],
        )
    return _discrete_scan(p, unary, w, neighbor_idx, compat, steps)


def _discrete_scan(p, unary, w, neighbor_idx, compat, steps):
    hp = jax.lax.Precision.HIGHEST

    def body(q, _):
        msg = gather_neighbors(q, neighbor_idx)               # [B, N, K, L]
        msg = jnp.einsum("bnk,bnkl->bnl", w, msg, precision=hp)
        q = jax.nn.softmax(-unary - jnp.dot(msg, compat, precision=hp), axis=-1)
        return q, None

    q, _ = jax.lax.scan(body, p, None, length=steps)
    return q
