"""Train-step tests: convergence, torch-parity of the loss, and
data-parallel equivalence on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crfconv_tpu.data.pipeline import synthetic_batch
from crfconv_tpu.models import PointConvResNet
from crfconv_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
from crfconv_tpu.train.losses import weighted_cross_entropy
from crfconv_tpu.train.train_state import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

B, N, C_IN, N_CLASSES = 2, 256, 6, 8


@pytest.fixture(scope="module")
def setup():
    batch = synthetic_batch(B, N, C_IN, N_CLASSES, seed=3)
    model = PointConvResNet(n_classes=N_CLASSES, use_crf=True, steps=1)
    tx = make_optimizer(lr=1e-2, steps_per_epoch=10)
    state = create_train_state(model, batch, tx, seed=0)
    return model, state, batch


class TestLossParity:
    def test_weighted_ce_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(1)
        logits = rng.randn(64, 5).astype(np.float32)
        labels = rng.randint(-1, 5, size=(64,))
        w = np.abs(rng.randn(5)).astype(np.float32) + 0.1

        ours = weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w),
            ignore_index=-1,
        )
        theirs = F.cross_entropy(
            torch.from_numpy(logits),
            torch.from_numpy(labels),
            weight=torch.from_numpy(w),
            ignore_index=-1,
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)

    def test_all_ignored_is_finite(self):
        logits = jnp.ones((4, 3))
        labels = jnp.full((4,), -1)
        out = weighted_cross_entropy(logits, labels, ignore_index=-1)
        assert np.isfinite(float(out))


class TestTrainStep:
    def test_loss_decreases(self, setup):
        model, state, batch = setup
        step = jax.jit(make_train_step(model))
        rng = jax.random.PRNGKey(0)
        losses = []
        for i in range(8):
            rng, sub = jax.random.split(rng)
            state, m = step(state, batch, sub)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_eval_step(self, setup):
        model, state, batch = setup
        ev = jax.jit(make_eval_step(model))
        out = ev(state, batch)
        assert out["probs"].shape == (B, N, N_CLASSES)
        assert out["confusion"].shape == (N_CLASSES, N_CLASSES)
        # confusion counts all (non-ignored) points
        assert int(np.asarray(out["confusion"]).sum()) == B * N


class TestDataParallel:
    def test_dp_matches_single_device(self, setup):
        model, state, _ = setup
        assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
        batch = synthetic_batch(8, N, C_IN, N_CLASSES, seed=11)
        step = make_train_step(model)
        rng = jax.random.PRNGKey(42)

        # single-device reference
        s1, m1 = jax.jit(step)(state, batch, rng)

        # 8-way data parallel through the parallel-step wrapper
        mesh = make_mesh(8)
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        pstep = make_parallel_train_step(step, mesh)
        s8, m8 = pstep(state_r, batch_s, rng)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=1e-5
        )
        l1 = jax.tree_util.tree_leaves(s1.params)
        l8 = jax.tree_util.tree_leaves(s8.params)
        for a, b in zip(l1, l8):
            # cross-device psum reduction order differs from the
            # single-device sum; tolerance covers that noise floor
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )
