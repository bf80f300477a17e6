"""Point-sharded pyramid build (parallel/spatial_build) vs the unsharded
builder: same key, bit-identical indices and positions.

N = 16384 over 8 devices exercises the three regimes in one build:
scale 0 fully halo-sharded (same-scale kNN + sharded sub + sharded
up-link), scale 1 sharded with the replicated cutover for its sub-scale,
and the replicated tail (scales 2-4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from crfconv_tpu.ops.neighbors import neighbor_mode
from crfconv_tpu.ops.windowed import build_pyramid_windowed
from crfconv_tpu.parallel import make_mesh
from crfconv_tpu.parallel.spatial_build import build_pyramid_windowed_spatial
import pytest


class TestSpatialBuild:
    @pytest.mark.slow
    def test_matches_unsharded_bitwise(self):
        mesh = make_mesh(8)
        rng = np.random.default_rng(0)
        pos_raw = jnp.asarray(rng.random((1, 16384, 3), dtype=np.float32))
        key = jax.random.PRNGKey(7)
        with neighbor_mode("windowed"):
            order, ref = build_pyramid_windowed(pos_raw, key=key)
            pos_sorted = jnp.take_along_axis(
                pos_raw, order[..., None], axis=1
            )
            got = build_pyramid_windowed_spatial(pos_sorted, mesh, key=key)

        assert len(got) == len(ref)
        for s, (g, r) in enumerate(zip(got, ref)):
            np.testing.assert_array_equal(
                np.asarray(g.pos), np.asarray(r.pos), err_msg=f"pos s{s}"
            )
            np.testing.assert_array_equal(
                np.asarray(g.neighbor_idx), np.asarray(r.neighbor_idx),
                err_msg=f"neighbor_idx s{s}",
            )
            np.testing.assert_array_equal(
                np.asarray(g.sub_idx), np.asarray(r.sub_idx),
                err_msg=f"sub_idx s{s}",
            )
            np.testing.assert_array_equal(
                np.asarray(g.up_idx), np.asarray(r.up_idx),
                err_msg=f"up_idx s{s}",
            )

    @pytest.mark.slow
    def test_end_to_end_sharded_serving(self):
        """sorted positions → sharded pyramid → sharded forward: logits
        must match the fully-unsharded windowed pipeline."""
        from crfconv_tpu.data.batch import PointBatch
        from crfconv_tpu.models import PointConvResNet
        from crfconv_tpu.parallel import make_spatial_forward

        mesh = make_mesh(8)
        rng = np.random.default_rng(2)
        pos_raw = jnp.asarray(rng.random((1, 16384, 3), dtype=np.float32))
        feats = jnp.asarray(rng.random((1, 16384, 4), dtype=np.float32))
        key = jax.random.PRNGKey(3)
        model = PointConvResNet(
            n_classes=5, use_crf=True, steps=1, layers=(8, 16, 32, 64, 128)
        )
        with neighbor_mode("windowed"):
            order, ref_scales = build_pyramid_windowed(pos_raw, key=key)
            x = jnp.take_along_axis(feats, order[..., None], axis=1)
            ref_batch = PointBatch(x=x, y=None, scales=ref_scales)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                ref_batch, train=False,
            )
            ref = model.apply(variables, ref_batch, train=False)

            pos_sorted = jnp.take_along_axis(
                pos_raw, order[..., None], axis=1
            )
            scales = build_pyramid_windowed_spatial(pos_sorted, mesh, key=key)
            batch = PointBatch(x=x, y=None, scales=scales)
            fn, info = make_spatial_forward(model, mesh, batch)
            out = fn(variables, batch)
        assert info["sharded_scales"] == [16384, 4096]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-5
        )

    @pytest.mark.slow
    def test_sharded_placement(self):
        mesh = make_mesh(8)
        rng = np.random.default_rng(1)
        pos = jnp.asarray(
            np.sort(rng.random((1, 16384, 3), dtype=np.float32), axis=1)
        )
        with neighbor_mode("windowed"):
            scales = build_pyramid_windowed_spatial(
                pos, mesh, key=jax.random.PRNGKey(0)
            )
        # scale-0 arrays sharded over the point axis, deep scales whole
        s0_shapes = {
            sh.data.shape for sh in scales[0].neighbor_idx.addressable_shards
        }
        assert s0_shapes == {(1, 16384 // 8, 16)}
        s3_shapes = {
            sh.data.shape for sh in scales[3].neighbor_idx.addressable_shards
        }
        assert s3_shapes == {(1, 256, 16)}
