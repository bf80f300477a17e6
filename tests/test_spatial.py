"""Spatial (point-axis) sharding: a windowed train step compiles and runs
with the N axis sharded over the 8-device CPU mesh, matching the
unsharded result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crfconv_tpu.data.batch import RawBatch
from crfconv_tpu.models import PointConvResNet
from crfconv_tpu.ops.neighbors import neighbor_mode
from crfconv_tpu.parallel import make_mesh, replicate, shard_points
from crfconv_tpu.train.train_state import (
    build_windowed_batch,
    create_train_state,
    make_optimizer,
    make_train_step,
)

RNG = np.random.default_rng(3)


def test_point_sharded_windowed_step():
    assert jax.device_count() >= 8
    B, N = 2, 2048
    raw = RawBatch(
        pos=jnp.asarray(RNG.random((B, N, 3), dtype=np.float32)),
        x=jnp.asarray(RNG.random((B, N, 6), dtype=np.float32)),
        y=jnp.asarray(RNG.integers(0, 8, (B, N)), dtype=jnp.int32),
    )
    model = PointConvResNet(n_classes=8, use_crf=True, steps=1)
    with neighbor_mode("windowed"):
        example = build_windowed_batch(raw, jax.random.PRNGKey(0))
        tx = make_optimizer(1e-2, steps_per_epoch=10)
        state = create_train_state(model, example, tx, seed=0)
        step = make_train_step(model, windowed=True)
        rng = jax.random.PRNGKey(1)

        _, m_ref = jax.jit(step, donate_argnums=())(state, raw, rng)

        mesh = make_mesh(8)
        state_r = replicate(state, mesh)
        raw_s = shard_points(raw, mesh)
        _, m_sp = jax.jit(step, donate_argnums=())(state_r, raw_s, rng)

    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_sp["loss"]), rtol=1e-4
    )
