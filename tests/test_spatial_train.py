"""Point-sharded spatial TRAINING vs the unsharded train step.

Same prebuilt windowed batch, same initial state: the spatial step's
loss must match exactly and the updated parameters / BN running stats to
reduction-order noise.  dropout_rate=0 so the comparison is
deterministic (BN train-mode statistics still exercise the psum path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from crfconv_tpu.data.batch import PointBatch
from crfconv_tpu.models import PointConvResNet
from crfconv_tpu.ops.neighbors import neighbor_mode
from crfconv_tpu.ops.windowed import build_pyramid_windowed
from crfconv_tpu.parallel import make_mesh
from crfconv_tpu.parallel.spatial_train import make_spatial_train_step
import pytest

from crfconv_tpu.train.train_state import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _batch(b, n, c_in, n_classes, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.random((b, n, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((b, n, c_in), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, n_classes, (b, n)), jnp.int32)
    order, scales = build_pyramid_windowed(pos, key=jax.random.PRNGKey(1))
    x = jnp.take_along_axis(feats, order[..., None], axis=1)
    y = jnp.take_along_axis(y, order, axis=1)
    return PointBatch(x=x, y=y, scales=scales)


class TestSpatialTrain2D:
    @pytest.mark.slow
    def test_dp_x_spatial_matches_unsharded(self):
        """DATA × POINT 2-D mesh (VERDICT r3 #8): batch sharded over 4
        devices, points over 2.  Loss must match the unsharded step
        exactly; params + BN running stats to reduction-order noise.
        N=8192 over 2 point-devices shards scales 0 and 1."""
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[:8]).reshape(4, 2)
        mesh = Mesh(devs, ("data", "points"))
        n_classes = 5
        model = PointConvResNet(
            n_classes=n_classes, use_crf=True, steps=1,
            layers=(8, 16, 32, 64, 128), dropout_rate=0.0,
        )
        with neighbor_mode("windowed"):
            batch = _batch(4, 8192, 4, n_classes)
            tx = make_optimizer(lr=0.05, steps_per_epoch=10)
            state_ref = create_train_state(model, batch, tx, seed=0)
            state_sp = create_train_state(model, batch, tx, seed=0)

            ref_step = jax.jit(make_train_step(model))
            sp_step = make_spatial_train_step(
                model, mesh, batch, axis="points", data_axis="data"
            )

            for i in range(2):
                rng = jax.random.PRNGKey(20 + i)
                state_ref, m_ref = ref_step(state_ref, batch, rng)
                state_sp, m_sp = sp_step(state_sp, batch, rng)
                np.testing.assert_allclose(
                    float(m_sp["loss"]), float(m_ref["loss"]),
                    rtol=1e-5, err_msg=f"loss step {i}",
                )
                np.testing.assert_array_equal(
                    np.asarray(m_sp["confusion"]),
                    np.asarray(m_ref["confusion"]),
                    err_msg=f"confusion step {i}",
                )

            for a, b in zip(
                jax.tree_util.tree_leaves(state_ref.params),
                jax.tree_util.tree_leaves(state_sp.params),
            ):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
                )
            for a, b in zip(
                jax.tree_util.tree_leaves(state_ref.batch_stats),
                jax.tree_util.tree_leaves(state_sp.batch_stats),
            ):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
                )


class TestSpatialTrain:
    @pytest.mark.slow
    def test_step_matches_unsharded(self):
        mesh = make_mesh(8)
        n_classes = 5
        model = PointConvResNet(
            n_classes=n_classes, use_crf=True, steps=1,
            layers=(8, 16, 32, 64, 128), dropout_rate=0.0,
        )
        with neighbor_mode("windowed"):
            batch = _batch(1, 16384, 4, n_classes)
            tx = make_optimizer(lr=0.05, steps_per_epoch=10)
            state_ref = create_train_state(model, batch, tx, seed=0)
            state_sp = create_train_state(model, batch, tx, seed=0)

            ref_step = jax.jit(make_train_step(model))
            sp_step = make_spatial_train_step(model, mesh, batch)

            for i in range(2):
                rng = jax.random.PRNGKey(10 + i)
                state_ref, m_ref = ref_step(state_ref, batch, rng)
                state_sp, m_sp = sp_step(state_sp, batch, rng)
                np.testing.assert_allclose(
                    float(m_sp["loss"]), float(m_ref["loss"]),
                    rtol=1e-5, err_msg=f"loss step {i}",
                )
                np.testing.assert_array_equal(
                    np.asarray(m_sp["confusion"]),
                    np.asarray(m_ref["confusion"]),
                    err_msg=f"confusion step {i}",
                )

            ref_leaves = jax.tree_util.tree_leaves(state_ref.params)
            sp_leaves = jax.tree_util.tree_leaves(state_sp.params)
            for a, b in zip(ref_leaves, sp_leaves):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
                )
            ref_bs = jax.tree_util.tree_leaves(state_ref.batch_stats)
            sp_bs = jax.tree_util.tree_leaves(state_sp.batch_stats)
            for a, b in zip(ref_bs, sp_bs):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
                )
