"""Windowed neighborhood regime: geometry consistency, gather exactness
(given window-consistent indices), kNN quality vs exact, and a full
flagship forward in windowed mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crfconv_tpu.ops.morton import morton_order_np
from crfconv_tpu.ops.neighbors import neighbor_mode
from crfconv_tpu.ops.windowed import (
    build_pyramid_windowed,
    check_window_consistency,
    window_knn,
    windowed_gather,
)

RNG = np.random.default_rng(42)


def _sorted_cloud(b=2, n=1024):
    pos = RNG.random((b, n, 3)).astype(np.float32)
    for i in range(b):
        pos[i] = pos[i][morton_order_np(pos[i])]
    return jnp.asarray(pos)


class TestWindowKnn:
    def test_indices_window_consistent(self):
        pos = _sorted_cloud()
        idx = window_knn(pos, 16)
        assert check_window_consistency(np.asarray(idx), pos.shape[1]) == 1.0

    def test_col0_is_self(self):
        pos = _sorted_cloud()
        idx = np.asarray(window_knn(pos, 8))
        np.testing.assert_array_equal(
            idx[:, :, 0],
            np.tile(np.arange(pos.shape[1]), (pos.shape[0], 1)),
        )

    def test_quality_vs_exact(self):
        from scipy.spatial import cKDTree

        pos = _sorted_cloud(1, 2048)
        idx = np.asarray(window_knn(pos, 16))[0]
        p = np.asarray(pos[0])
        d_win = np.linalg.norm(p[idx] - p[:, None], axis=-1)
        d_exact, _ = cKDTree(p).query(p, k=16)
        # windowed kNN may swap distant candidates for nearer in-window
        # ones; the mean neighbor distance stays within a few percent
        ratio = d_win.mean() / d_exact.mean()
        assert ratio < 1.1, ratio

    def test_bipartite(self):
        pos = _sorted_cloud(1, 1024)
        coarse = pos[:, ::4]
        up = window_knn(coarse, 1, query_pos=pos)
        assert up.shape == (1, 1024, 1)
        assert check_window_consistency(
            np.asarray(up), coarse.shape[1]
        ) == 1.0


class TestWindowedGather:
    @pytest.mark.parametrize("m,n,f,k", [(1024, 1024, 8, 16), (256, 1024, 32, 16), (1024, 256, 16, 1)])
    def test_matches_exact_gather(self, m, n, f, k):
        # window-consistent indices: near the diagonal scaled by n/m
        stride = n / m
        centers = (np.arange(m) * stride).astype(np.int64)
        idx = np.clip(
            centers[None, :, None] + RNG.integers(-100, 100, (2, m, k)),
            0, n - 1,
        ).astype(np.int32)
        assert check_window_consistency(idx, n) == 1.0
        x = RNG.random((2, n, f)).astype(np.float32)
        out = np.asarray(windowed_gather(jnp.asarray(x), jnp.asarray(idx)))
        ref = np.stack([x[b][idx[b]] for b in range(2)])
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

    def test_gather_grad_matches_exact(self):
        """Custom VJP (scatter-add transpose): grads through the windowed
        gather equal grads through the exact gather on the same indices
        (this is the rule that unlocks windowed TRAINING on TPU, where
        the Pallas forward has no JVP)."""
        import jax
        import jax.numpy as jnp

        n, k, f = 256, 8, 5
        idx = np.clip(
            np.arange(n)[None, :, None] + RNG.integers(-64, 64, (2, n, k)),
            0, n - 1,
        ).astype(np.int32)
        x = jnp.asarray(RNG.random((2, n, f)).astype(np.float32))
        w = jnp.asarray(RNG.random((2, n, k, f)).astype(np.float32))
        idxj = jnp.asarray(idx)

        g_w = jax.grad(
            lambda x_: jnp.sum(windowed_gather(x_, idxj) * w)
        )(x)
        g_e = jax.grad(
            lambda x_: jnp.sum(
                jnp.take_along_axis(
                    x_, idxj.reshape(2, n * k, 1), axis=1
                ).reshape(2, n, k, f)
                * w
            )
        )(x)
        np.testing.assert_allclose(
            np.asarray(g_w), np.asarray(g_e), rtol=1e-5, atol=1e-6
        )

    def test_select_min_k_matches_top_k(self):
        """Pallas min-extraction is bit-identical to lax.top_k(-d)
        (lowest-index tie-break), incl. ties and the -inf self-pin."""
        import jax
        import jax.numpy as jnp

        from crfconv_tpu.ops.windowed_pallas import select_min_k

        d = RNG.random((2, 3, 64, 256)).astype(np.float32)
        d[0, 0, 0, 10] = d[0, 0, 0, 20] = 0.0
        d[1, 2, 5, 7] = -np.inf
        out = np.asarray(select_min_k(jnp.asarray(d), 16, interpret=True))
        ref = np.asarray(jax.lax.top_k(-jnp.asarray(d), 16)[1])
        np.testing.assert_array_equal(out, ref)

    def test_select_min_k_packed_near_exact(self):
        """Packed-key selection (exact=False): ~2^-13-relative tie radius;
        overwhelming elementwise agreement with the exact variant, exact
        behavior on true ties and the -inf self-pin."""
        import jax
        import jax.numpy as jnp

        from crfconv_tpu.ops.windowed_pallas import select_min_k

        d = RNG.random((2, 3, 64, 512)).astype(np.float32)
        d[0, 0, 0, 10] = d[0, 0, 0, 20] = 0.25
        d[1, 2, 5, 7] = -np.inf
        out = np.asarray(
            select_min_k(jnp.asarray(d), 16, exact=False, interpret=True)
        )
        ref = np.asarray(jax.lax.top_k(-jnp.asarray(d), 16)[1])
        assert np.mean(out == ref) > 0.995
        np.testing.assert_array_equal(out[0, 0, 0, :2], ref[0, 0, 0, :2])
        assert out[1, 2, 5, 0] == 7

    def test_pallas_bwd_matches_scatter(self):
        """Fast same-scale gather VJP (transposed one-hot matmul +
        overlap-add) equals the scatter-add transpose."""
        import jax.numpy as jnp

        from crfconv_tpu.ops.windowed_pallas import (
            windowed_gather_bwd_pallas,
        )

        B, n, k, f = 2, 256, 15, 16
        idx = np.clip(
            np.arange(n)[None, :, None] + RNG.integers(-64, 64, (B, n, k)),
            0, n - 1,
        ).astype(np.int32)
        g = RNG.standard_normal((B, n, k, f)).astype(np.float32)
        dx = np.asarray(
            windowed_gather_bwd_pallas(
                jnp.asarray(g), jnp.asarray(idx), n, interpret=True
            )
        )
        ref = np.zeros((B, n, f), np.float32)
        np.add.at(
            ref,
            (np.arange(B)[:, None], idx.reshape(B, n * k)),
            g.reshape(B, n * k, f),
        )
        # atol at the hi/lo-bf16 split error floor (~2e-17 of the
        # summand scale): near-cancelling rows keep that absolute floor
        np.testing.assert_allclose(dx, ref, rtol=1e-3, atol=5e-4)

    def test_pallas_interpret_matches(self):
        from crfconv_tpu.ops.windowed_pallas import windowed_gather_pallas

        m = n = 256
        idx = np.clip(
            np.arange(m)[None, :, None] + RNG.integers(-64, 64, (1, m, 8)),
            0, n - 1,
        ).astype(np.int32)
        x = RNG.random((1, n, 16)).astype(np.float32)
        out = np.asarray(
            windowed_gather_pallas(
                jnp.asarray(x), jnp.asarray(idx), interpret=True
            )
        )
        ref = x[0][idx[0]][None]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("body", ["v1", "v2", "v3"])
    @pytest.mark.parametrize("k,strided", [(8, False), (5, False), (7, True)])
    def test_pallas_large_bodies_match(self, body, k, strided, monkeypatch):
        """Both large-gather kernel generations (v1 column-layout, v2
        transposed one-hot) against the exact gather, incl. odd K (v2
        pads the last pair) and a strided case whose window starts are
        only 8-aligned (v2 re-aligns them to 128 and shifts rel)."""
        from crfconv_tpu.ops import windowed_pallas

        monkeypatch.setattr(windowed_pallas, "LARGE_M", 128)
        m = 384
        n = 3 * m if strided else m
        idx = np.clip(
            (np.arange(m) * (n / m)).astype(np.int64)[None, :, None]
            + RNG.integers(-40, 40, (1, m, k)),
            0, n - 1,
        ).astype(np.int32)
        x = RNG.random((1, n, 11)).astype(np.float32)
        out = np.asarray(
            windowed_pallas.windowed_gather_pallas(
                jnp.asarray(x), jnp.asarray(idx), interpret=True,
                large_body=body,
            )
        )
        ref = x[0][idx[0]][None]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)


class TestWindowedPyramid:
    def test_build_and_consistency(self):
        pos = jnp.asarray(RNG.random((2, 1024, 3)).astype(np.float32))
        order, scales = build_pyramid_windowed(
            pos, key=jax.random.PRNGKey(0)
        )
        assert order.shape == (2, 1024)
        assert len(scales) == 5
        # every index tensor is window-consistent w.r.t. its gather shape
        for s in scales:
            n_src = s.pos.shape[1]
            assert check_window_consistency(
                np.asarray(s.neighbor_idx), n_src
            ) == 1.0
            assert check_window_consistency(
                np.asarray(s.sub_idx), n_src
            ) == 1.0
            assert check_window_consistency(
                np.asarray(s.up_idx), s.sub_idx.shape[1]
            ) == 1.0

    def test_flagship_forward_windowed(self):
        from crfconv_tpu.data.batch import PointBatch
        from crfconv_tpu.models import PointConvResNet

        pos = jnp.asarray(RNG.random((2, 512, 3)).astype(np.float32))
        feats = jnp.asarray(RNG.random((2, 512, 6)).astype(np.float32))
        order, scales = build_pyramid_windowed(
            pos, key=jax.random.PRNGKey(1)
        )
        feats = jnp.take_along_axis(feats, order[..., None], axis=1)
        batch = PointBatch(x=feats, y=None, scales=scales)
        model = PointConvResNet(n_classes=13, use_crf=True, steps=2)
        with neighbor_mode("windowed"):
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                batch, train=False,
            )
            out = model.apply(variables, batch, train=False)
        assert out.shape == (2, 512, 13)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_windowed_close_to_exact_forward(self):
        """Same model/weights, same windowed pyramid: gathers in windowed
        mode must reproduce exact-mode outputs (indices are in-window, so
        the only difference is the hi/lo bf16 selection path)."""
        from crfconv_tpu.data.batch import PointBatch
        from crfconv_tpu.models import PointConvResNet

        pos = jnp.asarray(RNG.random((1, 512, 3)).astype(np.float32))
        feats = jnp.asarray(RNG.random((1, 512, 6)).astype(np.float32))
        order, scales = build_pyramid_windowed(
            pos, key=jax.random.PRNGKey(1)
        )
        feats = jnp.take_along_axis(feats, order[..., None], axis=1)
        batch = PointBatch(x=feats, y=None, scales=scales)
        model = PointConvResNet(n_classes=13, use_crf=True, steps=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, train=False,
        )
        exact = model.apply(variables, batch, train=False)
        with neighbor_mode("windowed"):
            win = model.apply(variables, batch, train=False)
        np.testing.assert_allclose(
            np.asarray(exact), np.asarray(win), rtol=2e-2, atol=2e-2
        )


class TestWindowKnnFused:
    """The fused distance+selection kernel (window_knn_pallas) vs the
    XLA einsum + top_k reference path, via interpret mode on CPU."""

    def _ref(self, pos, k, query_pos=None):
        # on CPU window_knn takes the XLA path — that IS the reference
        return np.asarray(window_knn(pos, k, query_pos=query_pos))

    @pytest.mark.parametrize("n,k", [(1024, 16), (1000, 8)])
    def test_same_scale_matches_reference(self, n, k):
        from crfconv_tpu.ops.windowed_pallas import window_knn_pallas

        pos = _sorted_cloud(2, n)
        ref = self._ref(pos, k)
        out = np.asarray(window_knn_pallas(pos, k, interpret=True))
        # agreement is statistical, not bitwise: the kernel's VPU
        # distance accumulation rounds differently from the einsum at
        # tie level (~1e-4 of slots on random clouds)
        assert (ref == out).mean() > 0.999
        # col 0 is the query itself
        np.testing.assert_array_equal(
            out[:, :, 0], np.tile(np.arange(n), (2, 1))
        )
        assert check_window_consistency(out, n) == 1.0

    def test_packed_selection_near_exact(self):
        from crfconv_tpu.ops.windowed_pallas import window_knn_pallas

        pos = _sorted_cloud(2, 1024)
        ref = self._ref(pos, 16)
        out = np.asarray(
            window_knn_pallas(pos, 16, exact=False, interpret=True)
        )
        assert (ref == out).mean() > 0.99
        np.testing.assert_array_equal(
            out[:, :, 0], np.tile(np.arange(1024), (2, 1))
        )
        assert check_window_consistency(out, 1024) == 1.0

    def test_bipartite_up_index(self):
        from crfconv_tpu.ops.windowed_pallas import window_knn_pallas

        pos = _sorted_cloud(2, 1024)
        coarse = pos[:, ::4]
        ref = self._ref(coarse, 1, query_pos=pos)
        out = np.asarray(
            window_knn_pallas(coarse, 1, query_pos=pos, interpret=True)
        )
        assert (ref == out).mean() > 0.999


class TestFusedPointConv:
    def test_fused_matches_unfused_eval(self, monkeypatch):
        """Eval-mode fused point-conv kernel (gather + folded-BN weight
        MLP + K-reduce in one Pallas pass) against the unfused module
        path, with non-trivial running BN statistics."""
        from crfconv_tpu.models.point_conv_big import PointConv
        from crfconv_tpu.ops import conv_pallas

        n, k, h = 4096, 8, 8
        pos = jnp.asarray(RNG.random((1, n, 3)).astype(np.float32))
        x = jnp.asarray(RNG.standard_normal((1, n, h)).astype(np.float32))
        idx = np.clip(
            np.arange(n)[None, :, None] + RNG.integers(-48, 48, (1, n, k)),
            0, n - 1,
        ).astype(np.int32)
        idx = jnp.asarray(idx)

        model = PointConv(d_model=h)
        with neighbor_mode("windowed"):
            variables = model.init(
                jax.random.PRNGKey(0), x, pos, idx, train=False
            )
            # non-trivial running stats so the affine fold is exercised
            stats = jax.tree.map(
                lambda a: a + 0.1 + 0.05 * jnp.arange(a.size, dtype=a.dtype),
                variables["batch_stats"],
            )
            variables = {**variables, "batch_stats": stats}

            ref = model.apply(variables, x, pos, idx, train=False)
            monkeypatch.setattr(conv_pallas, "FUSED_MAX_H", 32)
            monkeypatch.setattr(conv_pallas, "FUSED_INTERPRET", True)
            got = model.apply(variables, x, pos, idx, train=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
        )

    def test_fused_strided_matches_unfused_eval(self, monkeypatch):
        """Strided fused body (conv + residual max-pool rider) against
        the unfused module path."""
        from crfconv_tpu.models.point_conv_big import PointConv
        from crfconv_tpu.ops import conv_pallas

        n, m, k, h, r = 16384, 4096, 8, 8, 16
        pos = _sorted_cloud(1, n)
        sub_pos = pos[:, ::4]
        x = jnp.asarray(RNG.standard_normal((1, n, h)).astype(np.float32))
        res = jnp.asarray(RNG.standard_normal((1, n, r)).astype(np.float32))
        # strided window-consistent indices: near the ×4 diagonal
        idx = np.clip(
            (np.arange(m) * 4)[None, :, None]
            + RNG.integers(-48, 48, (1, m, k)),
            0, n - 1,
        ).astype(np.int32)
        idx = jnp.asarray(idx)

        model = PointConv(d_model=h)
        with neighbor_mode("windowed"):
            variables = model.init(
                jax.random.PRNGKey(0), x, pos, idx,
                sub_pos=sub_pos, extra=res, train=False,
            )
            stats = jax.tree.map(
                lambda a: a + 0.1 + 0.05 * jnp.arange(a.size, dtype=a.dtype),
                variables["batch_stats"],
            )
            variables = {**variables, "batch_stats": stats}

            ref, ref_r = model.apply(
                variables, x, pos, idx, sub_pos=sub_pos, extra=res,
                train=False,
            )
            monkeypatch.setattr(conv_pallas, "FUSED_MAX_H", 32)
            monkeypatch.setattr(conv_pallas, "FUSED_INTERPRET", True)
            got, got_r = model.apply(
                variables, x, pos, idx, sub_pos=sub_pos, extra=res,
                train=False,
            )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
        )
        # the fused rider is bit-exact f32; the unfused reference went
        # through the hi/lo-bf16 windowed gather (~2^-16 relative error),
        # so compare at that floor rather than exactly
        np.testing.assert_allclose(
            np.asarray(got_r), np.asarray(ref_r), rtol=1e-3, atol=1e-4
        )
