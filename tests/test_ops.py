"""Unit tests for the dense neighbor / CRF ops.

Includes the closed-form fixed-point checks from SURVEY.md §4: with C=I
the mean-field update is x <- (z + Sx)/2; iterated to convergence the
state solves (I + C) x = z + (S x) C.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crfconv_tpu.ops import (
    crf_mean_field,
    discrete_crf_update,
    gather_neighbors,
    gaussian_similarity,
    knn_bruteforce,
    masked_softmax,
    max_pool_neighbors,
    remove_self_loop,
    upsample_nearest,
)

RNG = np.random.RandomState(0)


def rand(*shape):
    return jnp.asarray(RNG.randn(*shape).astype(np.float32))


class TestGather:
    def test_gather_matches_numpy(self):
        x = rand(2, 10, 4)
        idx = jnp.asarray(RNG.randint(0, 10, size=(2, 7, 3)), dtype=jnp.int32)
        out = gather_neighbors(x, idx)
        ref = np.stack([np.asarray(x)[b][np.asarray(idx)[b]] for b in range(2)])
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_upsample_nearest(self):
        x = rand(2, 5, 3)
        up = jnp.asarray(RNG.randint(0, 5, size=(2, 9, 1)), dtype=jnp.int32)
        out = upsample_nearest(x, up)
        assert out.shape == (2, 9, 3)
        ref = np.stack(
            [np.asarray(x)[b][np.asarray(up)[b, :, 0]] for b in range(2)]
        )
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_max_pool(self):
        x = rand(1, 6, 2)
        idx = jnp.asarray([[[0, 1, 2], [3, 4, 5]]], dtype=jnp.int32)
        out = max_pool_neighbors(x, idx)
        ref = np.stack(
            [np.asarray(x)[0, :3].max(0), np.asarray(x)[0, 3:].max(0)]
        )[None]
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_max_pool_mask(self):
        x = jnp.asarray([[[1.0], [5.0], [3.0]]])
        idx = jnp.asarray([[[0, 1, 2]]], dtype=jnp.int32)
        mask = jnp.asarray([[[True, False, True]]])
        out = max_pool_neighbors(x, idx, mask)
        assert float(out[0, 0, 0]) == 3.0

    def test_remove_self_loop(self):
        idx = jnp.arange(24, dtype=jnp.int32).reshape(1, 6, 4) % 6
        out = remove_self_loop(idx)
        assert out.shape == (1, 6, 3)


class TestMaskedSoftmax:
    def test_no_mask_matches_jax(self):
        x = rand(3, 5)
        np.testing.assert_allclose(
            masked_softmax(x), jax.nn.softmax(x, -1), rtol=1e-6
        )

    def test_masked_rows_zero(self):
        x = rand(2, 4)
        mask = jnp.asarray([[True, True, False, False], [False] * 4])
        out = masked_softmax(x, mask)
        np.testing.assert_allclose(np.asarray(out)[0, 2:], 0.0)
        np.testing.assert_allclose(np.asarray(out)[1], 0.0)
        assert abs(float(out[0].sum()) - 1.0) < 1e-6
        assert not np.any(np.isnan(np.asarray(out)))


class TestKnn:
    @pytest.mark.parametrize("n,m,k", [(64, 64, 8), (100, 40, 5)])
    def test_bruteforce_matches_scipy(self, n, m, k):
        from scipy.spatial import cKDTree

        pts = RNG.randn(2, n, 3).astype(np.float32)
        q = RNG.randn(2, m, 3).astype(np.float32)
        idx = np.asarray(knn_bruteforce(jnp.asarray(pts), jnp.asarray(q), k, tile=16))
        for b in range(2):
            _, ref = cKDTree(pts[b]).query(q[b], k=k)
            d_ours = np.linalg.norm(pts[b][idx[b]] - q[b][:, None], axis=-1)
            d_ref = np.linalg.norm(pts[b][ref] - q[b][:, None], axis=-1)
            # f32 matmul distance form loses ~1e-3 precision near ties;
            # neighbor *sets* may swap at the boundary but distances agree.
            np.testing.assert_allclose(np.sort(d_ours), np.sort(d_ref), atol=1e-2)

    def test_self_query_col0_is_self(self):
        pts = jnp.asarray(RNG.randn(1, 50, 3).astype(np.float32))
        idx = knn_bruteforce(pts, pts, 4)
        np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(50))


class TestCrf:
    def _setup(self, b=2, n=16, k=4, h=8):
        z = rand(b, n, h)
        idx = jnp.asarray(RNG.randint(0, n, size=(b, n, k)), dtype=jnp.int32)
        s = masked_softmax(rand(b, n, k))
        c = rand(h, h) * 0.3
        return z, s, idx, c

    def test_identity_compat_one_step(self):
        """With C=I, one step gives x = (z + Sz) / 2 (SURVEY §4)."""
        z, s, idx, _ = self._setup()
        h = z.shape[-1]
        c = jnp.eye(h)
        out = crf_mean_field(z, s, idx, c, steps=1)
        msg = jnp.einsum("bnk,bnkh->bnh", s, gather_neighbors(z, idx))
        np.testing.assert_allclose(out, (z + msg) / 2.0, rtol=1e-4, atol=1e-5)

    def test_fixed_point(self):
        """Iterated far enough, x solves (I+C)x = z + (Sx)C."""
        z, s, idx, c = self._setup()
        x = crf_mean_field(z, s, idx, c, steps=200)
        C = np.asarray(c).T @ np.asarray(c)
        msg = jnp.einsum("bnk,bnkh->bnh", s, gather_neighbors(x, idx))
        lhs = np.asarray(x) @ (np.eye(z.shape[-1]) + C)
        rhs = np.asarray(z) + np.asarray(msg) @ C
        np.testing.assert_allclose(lhs, rhs, rtol=2e-3, atol=2e-4)

    def test_zero_steps_is_identity(self):
        z, s, idx, c = self._setup()
        np.testing.assert_allclose(crf_mean_field(z, s, idx, c, steps=0), z)

    def test_similarity_rows_sum_to_one(self):
        y = rand(2, 12, 6)
        idx = jnp.asarray(RNG.randint(0, 12, size=(2, 12, 5)), dtype=jnp.int32)
        s = gaussian_similarity(y, idx)
        np.testing.assert_allclose(np.asarray(s).sum(-1), 1.0, rtol=1e-5)

    def test_discrete_crf_probabilities(self):
        b, n, k, l = 2, 10, 4, 6
        logits = rand(b, n, l)
        p = jax.nn.softmax(logits, -1)
        u = -jnp.log(p)
        w = jnp.abs(rand(b, n, k)) * 0.1
        idx = jnp.asarray(RNG.randint(0, n, size=(b, n, k)), dtype=jnp.int32)
        compat = jnp.eye(l)
        q = discrete_crf_update(p, u, w, idx, compat, steps=5)
        np.testing.assert_allclose(np.asarray(q).sum(-1), 1.0, rtol=1e-5)
        assert np.all(np.asarray(q) >= 0)


class TestTorchParity:
    """Golden parity vs a plain-torch re-execution of the reference math."""

    def test_crf_mean_field_matches_torch(self):
        import torch

        b, n, k, h, steps = 2, 12, 5, 8, 3
        z_np = RNG.randn(b, n, h).astype(np.float32)
        y_np = RNG.randn(b, n, h).astype(np.float32)
        idx_np = RNG.randint(0, n, size=(b, n, k)).astype(np.int64)
        c_np = (np.eye(h) + 0.1 * RNG.randn(h, h)).astype(np.float32)

        # --- torch re-execution of continuous_crf_conv_big.py:49-72 ---
        zt = torch.from_numpy(z_np)
        yt = torch.from_numpy(y_np)
        it = torch.from_numpy(idx_np)

        def t_gather(x, idx):
            B, F, K = x.shape[0], x.shape[-1], idx.shape[-1]
            idx2 = idx.reshape(B, -1, 1).repeat(1, 1, F)
            return x.gather(dim=1, index=idx2).reshape(B, -1, K, F)

        neigh = t_gather(yt, it)
        st = (yt.unsqueeze(2) - neigh).pow(2).sum(-1, keepdim=True)
        st = (-st).softmax(dim=2)
        ct = torch.from_numpy(c_np)
        C = ct.t().mm(ct)
        I = torch.eye(h)
        xt = zt.clone()
        for _ in range(steps):
            xt = t_gather(xt, it)
            xt = (st * xt).sum(dim=2)
            xt = zt + xt.matmul(C)
            xt = xt.matmul((I + C).inverse())

        # --- ours ---
        s = gaussian_similarity(
            jnp.asarray(y_np), jnp.asarray(idx_np, dtype=jnp.int32)
        )
        out = crf_mean_field(
            jnp.asarray(z_np),
            s,
            jnp.asarray(idx_np, dtype=jnp.int32),
            jnp.asarray(c_np),
            steps=steps,
        )
        np.testing.assert_allclose(
            np.asarray(out), xt.numpy(), rtol=1e-4, atol=1e-5
        )
