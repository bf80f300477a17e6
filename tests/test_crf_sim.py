"""Fused CRF similarity+message kernel (ops/crf_sim_pallas) vs the
unfused gather + gaussian_similarity + einsum reference."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crfconv_tpu.ops import crf_sim_pallas
from crfconv_tpu.ops.crf import gaussian_similarity
from crfconv_tpu.ops.neighbors import gather_neighbors, neighbor_mode

RNG = np.random.default_rng(0)


def _sorted_cloud(b, n):
    from crfconv_tpu.ops.morton import morton_order_np

    p = RNG.random((b, n, 3)).astype(np.float32)
    for i in range(b):
        p[i] = p[i][morton_order_np(p[i])]
    return jnp.asarray(p)


@pytest.mark.parametrize("h,k", [(8, 15), (16, 15), (8, 7)])
def test_sim_kernel_matches_unfused(h, k):
    n = 4096
    pos = _sorted_cloud(1, n)
    y = jnp.asarray(RNG.standard_normal((1, n, h)).astype(np.float32))
    z = jnp.asarray(RNG.standard_normal((1, n, h)).astype(np.float32))
    idx = np.clip(
        np.arange(n)[None, :, None] + RNG.integers(-48, 48, (1, n, k)),
        0, n - 1,
    ).astype(np.int32)
    idx = jnp.asarray(idx)

    with neighbor_mode("windowed"):
        g = gather_neighbors(jnp.concatenate([y, z], axis=-1), idx)
        yn, zn = g[..., :h], g[..., h:]
        s_ref = gaussian_similarity(y, idx, neighbors=yn)
        msg_ref = jnp.einsum(
            "bnk,bnkh->bnh", s_ref, zn,
            precision=jax.lax.Precision.HIGHEST,
        )
        msg, s = crf_sim_pallas.crf_similarity_message(
            y, z, idx, interpret=True
        )
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(s_ref), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(msg), np.asarray(msg_ref), rtol=2e-4, atol=2e-4
    )


def test_crf_conv_dispatch_matches(monkeypatch):
    """Full ContinuousCRFConv block: fused-sim dispatch vs the gather
    path (eval mode), at steps 1 and 2."""
    from crfconv_tpu.models.crf_conv import ContinuousCRFConv
    from crfconv_tpu.ops.windowed import build_pyramid_windowed

    n, h_out = 4096, 32
    pos = _sorted_cloud(1, n)
    with neighbor_mode("windowed"):
        _, scales = build_pyramid_windowed(pos, key=jax.random.PRNGKey(0))
        s0, s1 = scales[0], scales[1]
        unary = jnp.asarray(
            RNG.standard_normal((1, s1.pos.shape[1], 64)).astype(np.float32)
        )
        pairwise = jnp.asarray(
            RNG.standard_normal((1, n, h_out)).astype(np.float32)
        )
        for steps in (1, 2):
            model = ContinuousCRFConv(out_features=h_out, steps=steps)
            variables = model.init(
                jax.random.PRNGKey(0), unary, pairwise,
                s0.up_idx, s0.neighbor_idx, train=False,
            )
            ref = model.apply(
                variables, unary, pairwise, s0.up_idx, s0.neighbor_idx,
                train=False,
            )
            monkeypatch.setattr(crf_sim_pallas, "SIM_INTERPRET", True)
            monkeypatch.setattr(crf_sim_pallas, "SIM_MIN_ROWS", 0)
            got = model.apply(
                variables, unary, pairwise, s0.up_idx, s0.neighbor_idx,
                train=False,
            )
            monkeypatch.setattr(crf_sim_pallas, "SIM_INTERPRET", False)
            monkeypatch.setattr(crf_sim_pallas, "SIM_MIN_ROWS", 4096)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
            )
