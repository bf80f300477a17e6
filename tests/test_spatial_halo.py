"""Halo-exchange spatially-sharded CRF (parallel/spatial.py): the
shard_map path must match the global crf_mean_field bit-for-bit-ish on
the 8-device CPU mesh, communicate only via collective-permute (no
all-gather of full-N operands), and support chunked halo exchange for
deep iteration counts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crfconv_tpu.ops.crf import crf_mean_field
from crfconv_tpu.ops.neighbors import neighbor_mode
from crfconv_tpu.ops.windowed import check_window_consistency
from crfconv_tpu.parallel import crf_mean_field_spatial, make_mesh

RNG = np.random.default_rng(7)


def _inputs(b, n, h, k, reach=48):
    z = RNG.standard_normal((b, n, h)).astype(np.float32)
    logits = RNG.standard_normal((b, n, k)).astype(np.float32)
    s = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    idx = np.clip(
        np.arange(n)[None, :, None] + RNG.integers(-reach, reach, (b, n, k)),
        0, n - 1,
    ).astype(np.int32)
    assert check_window_consistency(idx, n) == 1.0
    c = (np.eye(h) + 0.1 * RNG.standard_normal((h, h))).astype(np.float32)
    return (
        jnp.asarray(z), jnp.asarray(s), jnp.asarray(idx), jnp.asarray(c)
    )


@pytest.mark.parametrize("steps", [1, 3])
def test_spatial_matches_global(steps):
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    # pad=32 keeps the halo small enough for a CPU-sized cloud:
    # width=384, H=steps*384 rounded to 128, local span must exceed 2H
    with neighbor_mode("windowed", tile=64, pad=32):
        n = 8 * 1792 if steps > 1 else 8 * 896
        z, s, idx, c = _inputs(1, n, 8, 8)
        ref = crf_mean_field(z, s, idx, c, steps=steps)
        out = crf_mean_field_spatial(
            z, s, idx, c, mesh, steps=steps, allow_fused=False
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
        )


def test_spatial_chunked_halo():
    """halo_steps=1 forces an exchange per step; result must still match."""
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    with neighbor_mode("windowed", tile=64, pad=32):
        z, s, idx, c = _inputs(1, 8 * 896, 8, 8)
        ref = crf_mean_field(z, s, idx, c, steps=3)
        out = crf_mean_field_spatial(
            z, s, idx, c, mesh, steps=3, halo_steps=1, allow_fused=False
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
        )


def test_spatial_hlo_has_no_allgather():
    """The whole point of the shard_map path: communication is halo
    collective-permutes, not GSPMD all-gathers of the full cloud."""
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    with neighbor_mode("windowed", tile=64, pad=32):
        z, s, idx, c = _inputs(1, 8 * 896, 8, 8)

        def fn(z, s, idx, c):
            return crf_mean_field_spatial(
                z, s, idx, c, mesh, steps=1, allow_fused=False
            )

        text = jax.jit(fn).lower(z, s, idx, c).compile().as_text()
    assert "collective-permute" in text
    assert "all-gather" not in text
