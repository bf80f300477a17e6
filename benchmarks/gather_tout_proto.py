"""Prototype A/B: transposed-OUTPUT variant of the v3 lane-gather body.

The integrated v3 body (ops/windowed_pallas.py::_kernel_large3) gathers
with VPU lane dynamic-gathers on a transposed [f8, width2] window, then
pays an in-kernel [f8, p*tile] -> [p*tile, f8] relayout per chunk to
write the standard [B, M, K*F] output.  This prototype keeps the
kernel's natural [f8, lanes] orientation all the way out — the kernel
writes [B, nt, f8, nchunk*p*tile] and XLA un-permutes outside (an
HBM-bandwidth transpose).  An earlier throwaway probe measured the
transposed-output form ~1.5x faster in-kernel at F=8; this harness
times both INCLUDING the outside relayout so the comparison is honest.

Run: JAX_PLATFORMS=axon python benchmarks/gather_tout_proto.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crfconv_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crfconv_tpu.ops.windowed import _pad_src, window_starts


def _kernel_tout(
    starts_ref, rel_ref, xpT_ref, out_ref, win_ref, sem,
    *, width2, tile, k_cols, feat, f8, nt, nb, p, nchunk,
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
    win = win_ref[slot]                              # [f8, width2] f32
    nwc = width2 // 128
    rel = rel_ref[0, 0]                              # [nchunk, p*tile]
    for j in range(nchunk):
        idxb = jnp.broadcast_to(rel[j : j + 1], (f8, p * tile))
        acc = jnp.zeros((f8, p * tile), jnp.float32)
        for c in range(nwc):
            src = win[:, c * 128 : (c + 1) * 128]
            loc = jnp.clip(idxb - c * 128, 0, 127)
            gth = jnp.take_along_axis(src, loc, axis=1)
            m = (idxb >= c * 128) & (idxb < (c + 1) * 128)
            acc = jnp.where(m, gth, acc)
        # no relayout: the [f8, lanes] result goes straight out
        out_ref[0, 0, :, j * p * tile : (j + 1) * p * tile] = acc


@functools.partial(jax.jit, static_argnames=("tile", "pad"))
def windowed_gather_tout(x, idx, tile=64, pad=128):
    B, n_src, F = x.shape
    M, K = idx.shape[1], idx.shape[2]
    starts, width, front = window_starts(M, n_src, tile, pad)
    nt = starts.shape[0]
    m_pad = nt * tile - M

    s_al = (starts // 128) * 128
    shift = starts - s_al
    width2 = -(-(width + int(shift.max())) // 128) * 128
    f8 = -(-F // 8) * 8
    xw = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, f8 - F)))
    xpT = jnp.swapaxes(_pad_src(xw, front, width2, s_al), 1, 2)

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

    out = pl.pallas_call(
        functools.partial(
            _kernel_tout, width2=width2, tile=tile, k_cols=K, feat=F,
            f8=f8, nt=nt, nb=B, p=p, nchunk=nchunk,
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, nchunk, p * tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, f8, nchunk * p * tile), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, nt, f8, nchunk * p * tile), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, f8, width2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(jnp.asarray(s_al, jnp.int32), rel_packed, xpT)
    # un-permute outside the kernel: cell lane q*tile+m of chunk j is
    # (k=j*p+q, row m)
    out = out.reshape(B, nt, f8, nchunk, p, tile)
    out = out.transpose(0, 1, 5, 3, 4, 2)            # [B,nt,tile,nchunk,p,f8]
    out = out.reshape(B, nt * tile, nchunk * p, f8)
    return out[:, :M, :K, :F].astype(x.dtype)


def main():
    from crfconv_tpu.ops.windowed_pallas import windowed_gather_pallas
    from crfconv_tpu.utils import device_time

    rng = np.random.default_rng(0)
    SHAPES = [
        ("s3dis-scale0-conv", 8, 8192, 16, 11),
        ("s3dis-scale0-crf", 8, 8192, 15, 16),
        ("sem3d-scale0-conv", 8, 65536, 16, 11),
        ("sem3d-scale0-crf", 8, 65536, 15, 16),
        ("sem3d-scale0-f32wide", 8, 65536, 16, 32),
    ]
    results = {}
    for label, B, N, K, F in SHAPES:
        x = jnp.asarray(rng.random((B, N, F), dtype=np.float32))
        idx = jnp.asarray(
            np.clip(
                np.arange(N)[None, :, None]
                + rng.integers(-96, 96, (B, N, K)),
                0, N - 1,
            ).astype(np.int32)
        )
        b_ix = jnp.arange(B)[:, None]
        ref = x[b_ix, idx.reshape(B, -1)].reshape(B, N, K, F)
        got = windowed_gather_tout(x, idx)
        err = float(jnp.abs(got - ref).max())

        def step_t(carry, idx=idx):
            out = windowed_gather_tout(carry, idx)
            return carry + 1e-9 * out[:, :, 0, :]

        def step_3(carry, idx=idx):
            out = windowed_gather_pallas(carry, idx, large_body="v3")
            return carry + 1e-9 * out[:, :, 0, :]

        def step_1(carry, idx=idx):
            out = windowed_gather_pallas(carry, idx, large_body="v1")
            return carry + 1e-9 * out[:, :, 0, :]

        tt = device_time(step_t, x, iters=10)
        t3 = device_time(step_3, x, iters=10)
        t1 = device_time(step_1, x, iters=10)
        results[label] = {
            "v1_ms": round(t1 * 1e3, 3),
            "v3_ms": round(t3 * 1e3, 3),
            "tout_ms": round(tt * 1e3, 3),
            "tout_err": err,
        }
        print(
            f"# {label}: v1 {t1*1e3:.3f}  v3 {t3*1e3:.3f}  "
            f"tout {tt*1e3:.3f} ms  (err {err:.1e})",
            file=sys.stderr, flush=True,
        )
    print(json.dumps({"metric": "gather tout prototype", **results}))


if __name__ == "__main__":
    main()
