"""Full-forward halo-exchange spatial sharding (parallel/spatial_forward).

Runs the UNMODIFIED flagship model point-sharded over the 8-virtual-
device CPU mesh and checks the logits against the unsharded windowed
forward.  N = 16384 is chosen so every dispatch branch of the spatial
gather executes in one forward:

  * scale 0 (16384 -> local 2048) and scale 1 (4096 -> local 512) are
    sharded: same-scale exchange gathers, the strided 0->1 exchange
    gather, and the sharded->sharded decoder upsample (h_t == local).
  * scale 2+ are replicated: the strided 1->2 gather takes the
    sharded-source/replicated-target all_gather branch, and the
    deconv out of replicated scale 2 into sharded scale 1 takes the
    infeasible-halo whole-op fallback.
  * the CRF decoders at scales 0/1 run the chunked halo iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crfconv_tpu.data.batch import PointBatch
from crfconv_tpu.models import PointConvResNet
from crfconv_tpu.ops.neighbors import neighbor_mode
from crfconv_tpu.ops.windowed import build_pyramid_windowed
from crfconv_tpu.parallel import make_mesh, make_spatial_forward
from crfconv_tpu.parallel.spatial_forward import (
    choose_sharded_scales,
    same_scale_halo,
)


def _windowed_batch(b, n, c_in, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.random((b, n, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((b, n, c_in), dtype=np.float32))
    order, scales = build_pyramid_windowed(pos, key=jax.random.PRNGKey(1))
    x = jnp.take_along_axis(feats, order[..., None], axis=1)
    return PointBatch(x=x, y=None, scales=scales)


class TestChooseShardedScales:
    def test_policy_16384_over_8(self):
        with neighbor_mode("windowed"):
            batch = _windowed_batch(1, 16384, 4)
            sharded = choose_sharded_scales(batch, 8, 64, 128)
        # local spans: 2048 and 512 >= the same-scale halo; 1024/8=128 is
        # below it
        assert sharded == {16384, 4096}

    def test_halo_is_tile_aligned(self):
        h = same_scale_halo(64, 128)
        assert h % 64 == 0 and h > 0

    def test_collision_degrades_safely(self):
        # D=4 at N=8192 collides (sharded local 2048 == scale-1 global);
        # the policy must fall back rather than build an ambiguous table
        with neighbor_mode("windowed"):
            batch = _windowed_batch(1, 8192, 4)
            sharded = choose_sharded_scales(batch, 4, 64, 128)
        keys = [n // 4 for n in sharded]
        lens = {
            leaf.shape[1]
            for leaf in jax.tree_util.tree_leaves(batch)
            if hasattr(leaf, "ndim") and leaf.ndim >= 2
        }
        repl = [n for n in lens if n not in sharded]
        assert len(set(keys + repl)) == len(keys) + len(repl)


class TestSpatialForward:
    @pytest.mark.parametrize("steps", [1, 2])
    @pytest.mark.slow
    def test_flagship_matches_unsharded(self, steps):
        mesh = make_mesh(8)
        model = PointConvResNet(
            n_classes=5, use_crf=True, steps=steps,
            layers=(8, 16, 32, 64, 128),
        )
        with neighbor_mode("windowed"):
            batch = _windowed_batch(1, 16384, 4)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                batch, train=False,
            )
            ref = model.apply(variables, batch, train=False)

            fn, info = make_spatial_forward(model, mesh, batch)
            assert info["sharded_scales"] == [16384, 4096]
            out = fn(variables, batch)

        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-5
        )

    @pytest.mark.slow
    def test_fused_conv_spatial_matches_unsharded(self, monkeypatch):
        """Point-sharded FUSED point-conv (VERDICT r3 #3): with the fused
        kernel armed (interpret mode), the spatial forward must match the
        unsharded fused forward.  D=8 at N=16384 exercises the sharded
        same-scale fused body (scales 0 and 1), the sharded→sharded
        strided body with the residual rider (0→1), and the
        sharded-source/replicated-target all-gather branch (1→2)."""
        from crfconv_tpu.ops import conv_pallas, crf_sim_pallas

        monkeypatch.setattr(conv_pallas, "FUSED_INTERPRET", True)
        monkeypatch.setattr(conv_pallas, "FUSED_MIN_ROWS", 0)
        # also arm the fused CRF similarity kernel: the decoders take the
        # spatial_crf_similarity exchange→kernel→trim route
        monkeypatch.setattr(crf_sim_pallas, "SIM_INTERPRET", True)
        monkeypatch.setattr(crf_sim_pallas, "SIM_MIN_ROWS", 0)
        mesh = make_mesh(8)
        model = PointConvResNet(
            n_classes=5, use_crf=True, steps=1, layers=(8, 16, 32, 64, 128),
        )
        with neighbor_mode("windowed"):
            batch = _windowed_batch(1, 16384, 4)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                batch, train=False,
            )
            ref = model.apply(variables, batch, train=False)
            # check_vma=False: interpret-mode pallas cannot type-check
            # under shard_map (its own loop counters are unvarying);
            # eval-only forward, so the AD hazard doesn't apply.  On
            # real hardware the compiled kernel runs with check_vma on.
            fn, info = make_spatial_forward(
                model, mesh, batch, check_vma=False
            )
            assert info["sharded_scales"] == [16384, 4096]
            out = fn(variables, batch)
        # the infeasible-halo fallbacks go through the hi/lo-bf16 unfused
        # gather on one side only; compare at that floor
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    @pytest.mark.slow
    def test_no_crf_path(self):
        mesh = make_mesh(8)
        model = PointConvResNet(
            n_classes=5, use_crf=False, layers=(8, 16, 32, 64, 128)
        )
        with neighbor_mode("windowed"):
            batch = _windowed_batch(1, 16384, 4)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                batch, train=False,
            )
            ref = model.apply(variables, batch, train=False)
            fn, _ = make_spatial_forward(model, mesh, batch)
            out = fn(variables, batch)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-5
        )

    @pytest.mark.slow
    def test_small_family_crf_net(self):
        """The spatial context generalizes beyond the flagship: the
        small-family SmallCRFNet (DSPointConv encoder, knn_interpolate,
        GuideCRFConv decoders) funnels through the same ops."""
        from crfconv_tpu.models.point_conv_small import SmallCRFNet

        mesh = make_mesh(8)
        model = SmallCRFNet(steps=1)
        with neighbor_mode("windowed"):
            batch = _windowed_batch(1, 16384, 4)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                batch, train=False,
            )
            ref = model.apply(variables, batch, train=False)
            fn, info = make_spatial_forward(model, mesh, batch)
            assert info["sharded_scales"] == [16384, 4096]
            out = fn(variables, batch)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-5
        )

    def test_alternate_window_geometry(self):
        """The halo math is generic in (tile, pad): t32-p64 shifts every
        derived quantity (width 256, halo 256) and must still match."""
        mesh = make_mesh(8)
        model = PointConvResNet(
            n_classes=5, use_crf=True, steps=1, layers=(8, 16, 32, 64, 128)
        )
        with neighbor_mode("windowed", tile=32, pad=64):
            batch = _windowed_batch(1, 8192, 4)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                batch, train=False,
            )
            ref = model.apply(variables, batch, train=False)
            fn, info = make_spatial_forward(model, mesh, batch)
            assert info["sharded_scales"], info
            out = fn(variables, batch)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-5
        )

    @pytest.mark.slow
    def test_discrete_crf_segnet(self):
        """Discrete CRF (CRF-as-RNN) under point sharding: the segnet's
        in-model kNN(32) runs halo-exchanged and the discrete mean field
        runs as chunked halo iterations."""
        from crfconv_tpu.models.segnets import BaselineDiscreteCRFSegNet

        mesh = make_mesh(8)
        model = BaselineDiscreteCRFSegNet(n_classes=5, steps=2)
        with neighbor_mode("windowed"):
            batch = _windowed_batch(1, 16384, 4)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                batch, train=False,
            )
            ref_p, ref_q = model.apply(variables, batch, train=False)
            fn, info = make_spatial_forward(model, mesh, batch)
            assert info["sharded_scales"] == [16384, 4096]
            out_p, out_q = fn(variables, batch)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(ref_p), rtol=0, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_q), np.asarray(ref_q), rtol=0, atol=2e-5
        )

    @pytest.mark.slow
    def test_output_is_point_sharded(self):
        mesh = make_mesh(8)
        model = PointConvResNet(
            n_classes=5, use_crf=True, steps=1, layers=(8, 16, 32, 64, 128)
        )
        with neighbor_mode("windowed"):
            batch = _windowed_batch(1, 16384, 4)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                batch, train=False,
            )
            fn, _ = make_spatial_forward(model, mesh, batch)
            out = fn(variables, batch)
        shard_shapes = {s.data.shape for s in out.addressable_shards}
        assert shard_shapes == {(1, 16384 // 8, 5)}
