"""Fused Pallas CRF mean-field kernel: parity vs the scan implementation
(identical math, interpret mode on CPU) and VJP wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crfconv_tpu.ops.crf import _crf_scan, _discrete_scan, crf_mean_field
from crfconv_tpu.ops.crf_pallas import (
    crf_mean_field_windowed_fused,
    discrete_crf_windowed_fused,
)
from crfconv_tpu.ops.windowed import check_window_consistency

RNG = np.random.default_rng(42)


def _window_consistent_idx(b, n, k, reach=64):
    idx = np.clip(
        np.arange(n)[None, :, None] + RNG.integers(-reach, reach, (b, n, k)),
        0, n - 1,
    ).astype(np.int32)
    assert check_window_consistency(idx, n) == 1.0
    return idx


def _inputs(b, n, h, k, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((b, n, h)).astype(np.float32)
    logits = rng.standard_normal((b, n, k)).astype(np.float32)
    s = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    idx = _window_consistent_idx(b, n, k)
    c = (np.eye(h) + 0.1 * rng.standard_normal((h, h))).astype(np.float32)
    return z, s, idx, c


@pytest.mark.parametrize(
    "b,n,h,k,steps",
    [
        (2, 512, 8, 15, 3),     # big-family finest decoder scale shape
        (1, 256, 32, 9, 10),    # small-family GuideCRF shape, steps=10
        (1, 128, 16, 5, 2),     # single-tile case (nt == 1)
    ],
)
def test_fused_matches_scan(b, n, h, k, steps):
    z, s, idx, c = _inputs(b, n, h, k, seed=b * 100 + h)
    ref = np.asarray(
        _crf_scan(
            jnp.asarray(z), jnp.asarray(s), jnp.asarray(idx),
            jnp.asarray(c), steps,
        )
    )
    out = np.asarray(
        crf_mean_field_windowed_fused(
            jnp.asarray(z), jnp.asarray(s), jnp.asarray(idx),
            jnp.asarray(c), steps, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_fused_duplicate_and_masked_neighbors():
    """Duplicate indices accumulate; zero-weight (masked) slots drop out —
    matching the scan's per-k independent contributions."""
    b, n, h, k, steps = 1, 256, 8, 7, 4
    z, s, idx, c = _inputs(b, n, h, k, seed=9)
    idx[:, :, 1] = idx[:, :, 0]          # duplicates
    s[:, :, 3] = 0.0                     # masked-out slot
    ref = np.asarray(
        _crf_scan(
            jnp.asarray(z), jnp.asarray(s), jnp.asarray(idx),
            jnp.asarray(c), steps,
        )
    )
    out = np.asarray(
        crf_mean_field_windowed_fused(
            jnp.asarray(z), jnp.asarray(s), jnp.asarray(idx),
            jnp.asarray(c), steps, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_fused_vjp_matches_scan_grad(monkeypatch):
    """The custom VJP routes backward through the scan: grads of the
    dispatcher must equal grads of the scan exactly."""
    from crfconv_tpu.ops import crf as crf_mod

    b, n, h, k, steps = 1, 256, 8, 5, 3
    z, s, idx, c = _inputs(b, n, h, k, seed=3)
    zj, sj, ij, cj = map(jnp.asarray, (z, s, idx, c))
    # linear loss → constant cotangent → both paths route the SAME g
    # through the scan VJP and must agree exactly (a quadratic loss would
    # fold the ~1e-4 fused-vs-scan forward delta into the cotangent)
    gw = jnp.asarray(
        np.random.default_rng(8).standard_normal((b, n, h)), jnp.float32
    )

    def loss_scan(z_, s_, c_):
        return jnp.sum(_crf_scan(z_, s_, ij, c_, steps) * gw)

    def loss_fused(z_, s_, c_):
        return jnp.sum(
            crf_mod._crf_fused(z_, s_, ij, c_, steps, 128, 192) * gw
        )

    # force the fused forward through the interpret-mode kernel on CPU
    from crfconv_tpu.ops import crf_pallas

    orig = crf_pallas.crf_mean_field_windowed_fused
    monkeypatch.setattr(
        crf_pallas, "crf_mean_field_windowed_fused",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )

    g_ref = jax.grad(loss_scan, argnums=(0, 1, 2))(zj, sj, cj)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(zj, sj, cj)
    for a, b_ in zip(g_ref, g_fused):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
        )


def test_dispatch_stays_on_scan_for_training():
    """crf_mean_field with allow_fused=False (training) must not touch the
    Pallas path even in windowed mode."""
    from crfconv_tpu.ops.neighbors import neighbor_mode

    b, n, h, k = 1, 256, 8, 5
    z, s, idx, c = _inputs(b, n, h, k, seed=4)
    with neighbor_mode("windowed"):
        out = crf_mean_field(
            jnp.asarray(z), jnp.asarray(s), jnp.asarray(idx),
            jnp.asarray(c), steps=2, allow_fused=False,
        )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "b,n,l,k,steps",
    [
        (2, 512, 20, 31, 5),    # ScanNet dual-model shape (kNN 32 - self)
        (1, 128, 8, 9, 10),     # single-tile case
    ],
)
def test_discrete_fused_matches_scan(b, n, l, k, steps):
    """Fused CRF-as-RNN (softmax update) vs the scan implementation."""
    rng = np.random.default_rng(b * 10 + l)
    logits = rng.standard_normal((b, n, l)).astype(np.float32)
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    u = -np.log(np.maximum(p, 1e-12)).astype(np.float32)
    w = (rng.random((b, n, k)) * 0.5).astype(np.float32)
    w[:, :, 2] = 0.0                       # masked-out slot
    idx = _window_consistent_idx(b, n, k)
    compat = np.eye(l, dtype=np.float32) + 0.05 * rng.standard_normal(
        (l, l)
    ).astype(np.float32)

    ref = np.asarray(
        _discrete_scan(
            jnp.asarray(p), jnp.asarray(u), jnp.asarray(w),
            jnp.asarray(idx), jnp.asarray(compat), steps,
        )
    )
    out = np.asarray(
        discrete_crf_windowed_fused(
            jnp.asarray(p), jnp.asarray(u), jnp.asarray(w),
            jnp.asarray(idx), jnp.asarray(compat), steps, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-5)
    # probabilities: rows sum to 1
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)


def test_fused_dispatch_guards(monkeypatch):
    """ADVICE r2 regressions: the fused dispatcher must reject pyramid
    tiles the 128-row kernel tiles cannot cover, and VMEM-exceeding
    shapes, falling back to the scan instead of corrupting output or
    failing at Mosaic compile time."""
    from crfconv_tpu.ops import crf
    from crfconv_tpu.ops.crf import _fused_ok, _fused_vmem_bytes

    # the guard also requires the TPU backend; fake it so the geometry
    # and VMEM clauses are what is under test here
    monkeypatch.setattr(crf.jax, "default_backend", lambda: "tpu")
    ok_mode = {"mode": "windowed", "tile": 64, "pad": 128}
    # geometry guards
    for tile in (96, 256, 48):
        assert not _fused_ok(8192, 32, 10, {**ok_mode, "tile": tile})
    for tile in (32, 64, 128):
        assert _fused_ok(8192, 32, 10, {**ok_mode, "tile": tile})
    # mode/steps/backend guards
    assert not _fused_ok(8192, 32, 1, ok_mode)
    assert not _fused_ok(8192, 32, 10, {**ok_mode, "mode": "exact"})
    # VMEM guard: Semantic3D-scale N with a wide hidden dim must fall back
    assert _fused_vmem_bytes(65536, 64, 64, 128) > 12 * 1024 * 1024
    assert not _fused_ok(65536, 64, 10, ok_mode)


def test_crf_mean_field_is_unjitted_dispatcher():
    """The dispatcher must re-read the neighbor-mode global on every call
    (a jitted dispatcher cached the mode in its trace, ADVICE r2)."""
    from crfconv_tpu.ops import crf

    assert not hasattr(crf.crf_mean_field, "lower"), (
        "crf_mean_field must not be jax.jit-wrapped"
    )
