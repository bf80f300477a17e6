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


def test_fused_vjp_matches_scan_grad():
    """Gradients of the public fused wrapper (NATIVE fused VJP since r3)
    must match autodiff through the scan, including the small-matrix
    chain into c."""
    b, n, h, k, steps = 1, 256, 8, 5, 3
    z, s, idx, c = _inputs(b, n, h, k, seed=3)
    zj, sj, ij, cj = map(jnp.asarray, (z, s, idx, c))
    gw = jnp.asarray(
        np.random.default_rng(8).standard_normal((b, n, h)), jnp.float32
    )

    def loss_scan(z_, s_, c_):
        return jnp.sum(_crf_scan(z_, s_, ij, c_, steps) * gw)

    def loss_fused(z_, s_, c_):
        return jnp.sum(
            crf_mean_field_windowed_fused(
                z_, s_, ij, c_, steps, 128, 192, interpret=True
            )
            * gw
        )

    g_ref = jax.grad(loss_scan, argnums=(0, 1, 2))(zj, sj, cj)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(zj, sj, cj)
    for a, b_ in zip(g_ref, g_fused):
        aa, bb = np.asarray(a), np.asarray(b_)
        rel = np.abs(aa - bb).max() / (np.abs(aa).max() + 1e-9)
        assert rel < 2e-5, rel


def test_dispatch_stays_on_scan_for_training():
    """crf_mean_field with allow_fused=False must not touch the Pallas
    path even in windowed mode (models pass allow_fused=True since r3 —
    the flag remains the opt-out for debugging/parity runs)."""
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


class TestCrfCoreNativeBwd:
    """The native fused backward (r3): crf_core's custom VJP — a reverse
    banded recurrence — vs autodiff through the scan re-execution."""

    def _geom(self, b=2, n=512, h=16, k=9, seed=7):
        from crfconv_tpu.ops.morton import morton_order
        from crfconv_tpu.ops.windowed import window_knn

        rng = np.random.default_rng(seed)
        pos = jnp.asarray(rng.random((b, n, 3), dtype=np.float32))
        o = morton_order(pos)
        pos = jnp.take_along_axis(pos, o[..., None], axis=1)
        idx = window_knn(pos, k)
        z = jnp.asarray(rng.standard_normal((b, n, h)).astype(np.float32))
        zp = jnp.asarray(rng.standard_normal((b, n, h)).astype(np.float32))
        s = jnp.asarray(rng.random((b, n, k), dtype=np.float32))
        s = s / s.sum(-1, keepdims=True)
        M = jnp.asarray(
            (0.1 * rng.standard_normal((h, h))).astype(np.float32)
        )
        return z, zp, s, idx, M

    @pytest.mark.parametrize("steps", [1, 4])
    def test_grad_matches_scan(self, steps):
        from crfconv_tpu.ops.crf_pallas import _core_scan, crf_core

        z, zp, s, idx, M = self._geom()
        rng = np.random.default_rng(8)
        gw = jnp.asarray(
            rng.standard_normal(z.shape).astype(np.float32)
        )

        def loss_ref(z_, zp_, s_, M_):
            return jnp.sum(_core_scan(z_, zp_, s_, idx, M_, steps, 64, 128) * gw)

        def loss_core(z_, zp_, s_, M_):
            return jnp.sum(crf_core(z_, zp_, s_, idx, M_, steps, 64, 128, True) * gw)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(z, zp, s, M)
        g_core = jax.grad(loss_core, argnums=(0, 1, 2, 3))(z, zp, s, M)
        for name, a, b in zip(("dz", "dzp", "ds", "dM"), g_ref, g_core):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
            assert rel < 2e-5, (name, rel)

    def test_grad_through_crf_fused_composition(self):
        """Gradient wrt (z, s, c) through the full _crf_fused composition
        (compat products + crf_core) vs the plain scan — the exact path
        models take in training."""
        from crfconv_tpu.ops import crf as crf_mod

        z, _, s, idx, _ = self._geom(h=16)
        rng = np.random.default_rng(9)
        c = jnp.asarray(
            (0.2 * rng.standard_normal((16, 16))).astype(np.float32)
        )
        gw = jnp.asarray(rng.standard_normal(z.shape).astype(np.float32))
        steps = 3

        def loss_scan(z_, s_, c_):
            return jnp.sum(crf_mod._crf_scan(z_, s_, idx, c_, steps) * gw)

        def loss_fused(z_, s_, c_):
            from crfconv_tpu.ops.crf_pallas import (
                _compat_products, crf_core,
            )

            _, inv, M = _compat_products(c_, 16)
            zp = jnp.einsum(
                "bnh,hk->bnk", z_, inv,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.sum(
                crf_core(z_, zp, s_, idx, M, steps, 64, 128, True) * gw
            )

        g_ref = jax.grad(loss_scan, argnums=(0, 1, 2))(z, s, c)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(z, s, c)
        for name, a, b in zip(("dz", "ds", "dc"), g_ref, g_fused):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
            assert rel < 2e-5, (name, rel)

    def test_vmem_fallback_grad(self, monkeypatch):
        """When the backward kernel exceeds VMEM the VJP must fall back
        to the scan re-execution and still be correct."""
        from crfconv_tpu.ops import crf_pallas

        monkeypatch.setattr(
            crf_pallas, "core_bwd_vmem_bytes", lambda *a: 10**12
        )
        from crfconv_tpu.ops.crf_pallas import _core_scan, crf_core

        z, zp, s, idx, M = self._geom(n=256, k=5)
        gw = jnp.ones_like(z)
        steps = 2

        def loss_ref(z_):
            return jnp.sum(_core_scan(z_, zp, s, idx, M, steps, 64, 128) * gw)

        def loss_core(z_):
            return jnp.sum(crf_core(z_, zp, s, idx, M, steps, 64, 128, True) * gw)

        a = np.asarray(jax.grad(loss_ref)(z))
        b = np.asarray(jax.grad(loss_core)(z))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 2e-5, rel


class TestDiscreteNativeBwd:
    """The native fused discrete backward (r3): discrete_crf_core's
    custom VJP — reverse recurrence with the per-step softmax VJP —
    vs autodiff through the scan."""

    def _inputs(self, b=2, n=512, l=13, k=9, seed=11):
        rng = np.random.default_rng(seed)
        logits = rng.standard_normal((b, n, l)).astype(np.float32)
        p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        u = -np.log(np.maximum(p, 1e-12)).astype(np.float32)
        w = (rng.random((b, n, k)) * 0.5).astype(np.float32)
        idx = _window_consistent_idx(b, n, k)
        compat = np.eye(l, dtype=np.float32) + 0.05 * rng.standard_normal(
            (l, l)
        ).astype(np.float32)
        gw = rng.standard_normal((b, n, l)).astype(np.float32)
        return tuple(
            jnp.asarray(a) for a in (p, u, w, idx, compat, gw)
        )

    @pytest.mark.parametrize("steps", [1, 5])
    def test_grad_matches_scan(self, steps):
        from crfconv_tpu.ops.crf_pallas import discrete_crf_core

        p, u, w, idx, compat, gw = self._inputs()

        def loss_ref(p_, u_, w_, c_):
            return jnp.sum(_discrete_scan(p_, u_, w_, idx, c_, steps) * gw)

        def loss_core(p_, u_, w_, c_):
            return jnp.sum(
                discrete_crf_core(p_, u_, w_, idx, c_, steps, 64, 128, True)
                * gw
            )

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(p, u, w, compat)
        g_core = jax.grad(loss_core, argnums=(0, 1, 2, 3))(p, u, w, compat)
        for name, a, b in zip(("dp", "du", "dw", "dcompat"), g_ref, g_core):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
            assert rel < 2e-4, (name, rel)

    def test_grad_with_duplicates_and_masked(self):
        """Duplicate neighbor slots and zero-weight (masked) slots must
        backprop exactly like the scan's independent per-k paths."""
        from crfconv_tpu.ops.crf_pallas import discrete_crf_core

        p, u, w, idx, compat, gw = self._inputs(seed=13)
        idx = idx.at[:, :, 1].set(idx[:, :, 0])    # duplicates
        w = w.at[:, :, 3].set(0.0)                 # masked-out slot
        steps = 3

        def loss_ref(w_):
            return jnp.sum(_discrete_scan(p, u, w_, idx, compat, steps) * gw)

        def loss_core(w_):
            return jnp.sum(
                discrete_crf_core(p, u, w_, idx, compat, steps, 64, 128, True)
                * gw
            )

        a = np.asarray(jax.grad(loss_ref)(w))
        b = np.asarray(jax.grad(loss_core)(w))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 2e-4, rel

    def test_vmem_fallback_grad(self, monkeypatch):
        """When the backward kernel exceeds VMEM the VJP must fall back
        to the scan re-execution and still be correct."""
        from crfconv_tpu.ops import crf_pallas

        monkeypatch.setattr(
            crf_pallas, "discrete_bwd_vmem_bytes", lambda *a: 10**12
        )
        from crfconv_tpu.ops.crf_pallas import discrete_crf_core

        p, u, w, idx, compat, gw = self._inputs(n=256, k=5, seed=17)
        steps = 2

        def loss_ref(p_):
            return jnp.sum(_discrete_scan(p_, u, w, idx, compat, steps) * gw)

        def loss_core(p_):
            return jnp.sum(
                discrete_crf_core(p_, u, w, idx, compat, steps, 64, 128, True)
                * gw
            )

        a = np.asarray(jax.grad(loss_ref)(p))
        b = np.asarray(jax.grad(loss_core)(p))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 2e-5, rel


def test_fused_kill_switch(monkeypatch):
    """CRFCONV_CRF_FUSED=0 must force the scan path regardless of shape
    (the r5 mitigation for the small-family steps=10 train programs'
    Mosaic scoped-vmem stack overflow)."""
    import os

    from crfconv_tpu.ops.crf import _fused_ok

    mode = {"mode": "windowed", "tile": 64, "pad": 128}
    monkeypatch.setenv("CRFCONV_CRF_FUSED", "0")
    assert not _fused_ok(8192, 16, 10, mode, 8)
    monkeypatch.delenv("CRFCONV_CRF_FUSED")
    # without the switch the guard's own rules decide (TPU-only here,
    # so on the CPU test host it still returns False via the backend
    # check — the assertion is that the switch short-circuits first)
    assert isinstance(_fused_ok(8192, 16, 10, mode, 8), bool)
