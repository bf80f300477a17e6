"""Curve-orientation jitter + multi-view eval (VERDICT r3 #1 machinery).

The windowed regime's cross-tile accuracy gap is attacked by (a)
train-time random curve orientation and (b) eval-time orientation
ensembling.  These tests pin the supporting invariants:

  * a rotated Morton order is still a permutation and the pyramid built
    under it stays window-consistent (the geometry is order-agnostic);
  * different orientations produce different orders (else the ensemble
    is vacuous);
  * the multi-view eval step returns probabilities in RAW point order
    (scatter inverse of the sort), normalized, with matching point_idx.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crfconv_tpu.data.batch import RawBatch
from crfconv_tpu.ops.morton import (
    morton_order,
    random_rotation,
    view_rotation,
)
from crfconv_tpu.ops.neighbors import neighbor_mode
from crfconv_tpu.ops.windowed import (
    build_pyramid_windowed,
    check_window_consistency,
)

B, N = 2, 1024


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((B, N, 3), dtype=np.float32))


def test_rotated_order_is_permutation(cloud):
    rot = view_rotation(1)
    order = np.asarray(morton_order(cloud, rot=rot))
    for b in range(B):
        assert sorted(order[b].tolist()) == list(range(N))


def test_view_rotations_are_rotations():
    for v in (1, 2, 3):
        r = np.asarray(view_rotation(v))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        assert abs(np.linalg.det(r) - 1.0) < 1e-5
    assert view_rotation(0) is None


def test_random_rotation_uniformity():
    r = np.asarray(random_rotation(jax.random.PRNGKey(3)))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(r) - 1.0) < 1e-5
    r2 = np.asarray(random_rotation(jax.random.PRNGKey(4)))
    assert not np.allclose(r, r2)


def test_orientations_decorrelate_orders(cloud):
    o0 = np.asarray(morton_order(cloud))
    o1 = np.asarray(morton_order(cloud, rot=view_rotation(1)))
    # the two orders must be substantially different permutations
    assert (o0 != o1).mean() > 0.5


def test_rotated_pyramid_window_consistent(cloud):
    _, scales = build_pyramid_windowed(
        cloud, key=jax.random.PRNGKey(0), curve_rot=view_rotation(1)
    )
    for s in scales[:2]:
        frac = check_window_consistency(
            np.asarray(s.neighbor_idx), s.pos.shape[1]
        )
        assert frac == 1.0


def test_multi_view_eval_raw_order():
    from crfconv_tpu.models import PointConvResNet
    from crfconv_tpu.train.train_state import (
        build_windowed_batch,
        create_train_state,
        make_eval_step,
        make_optimizer,
    )

    rng = np.random.default_rng(1)
    n, c = 512, 5
    pos = jnp.asarray(rng.random((1, n, 3), dtype=np.float32))
    x = jnp.asarray(rng.random((1, n, 6), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, c, (1, n)), jnp.int32)
    pidx = jnp.arange(n, dtype=jnp.int32)[None]
    raw = RawBatch(pos=pos, x=x, y=y, point_idx=pidx)

    with neighbor_mode("windowed"):
        model = PointConvResNet(n_classes=c, use_crf=True, steps=1)
        state = create_train_state(
            model,
            build_windowed_batch(raw, jax.random.PRNGKey(0)),
            make_optimizer(lr=0.01),
        )
        # sorted-order reference view 0
        e1 = make_eval_step(model, windowed=True, eval_views=1)(
            state, raw, jax.random.PRNGKey(7)
        )
        e2 = make_eval_step(model, windowed=True, eval_views=2)(
            state, raw, jax.random.PRNGKey(7)
        )
    p2 = np.asarray(e2["probs"])
    assert p2.shape == (1, n, c)
    np.testing.assert_allclose(p2.sum(-1), 1.0, atol=1e-4)
    # multi-view outputs are raw-aligned: point_idx passes through
    np.testing.assert_array_equal(np.asarray(e2["point_idx"]), pidx)
    np.testing.assert_array_equal(np.asarray(e2["labels"]), np.asarray(y))
    # view 0 of the ensemble is the single-view pass un-permuted: the
    # 2-view average must be within 0.5 of it everywhere (probability
    # space), and differ somewhere (view 1 contributes)
    p1 = np.asarray(e1["probs"])  # sorted order
    i1 = np.asarray(e1["point_idx"])  # raw ids per sorted row
    p1_raw = np.zeros_like(p1)
    p1_raw[0, i1[0]] = p1[0]
    assert np.abs(p2 - p1_raw).max() < 0.5 + 1e-6
    assert np.abs(p2 - p1_raw).max() > 1e-6
    # confusion consistent with averaged argmax in raw order
    total = int(np.asarray(e2["confusion"]).sum())
    assert total == n


def test_jitter_train_step_runs():
    from crfconv_tpu.models import PointConvResNet
    from crfconv_tpu.train.train_state import (
        build_windowed_batch,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    rng = np.random.default_rng(2)
    n, c = 512, 5
    raw = RawBatch(
        pos=jnp.asarray(rng.random((1, n, 3), dtype=np.float32)),
        x=jnp.asarray(rng.random((1, n, 6), dtype=np.float32)),
        y=jnp.asarray(rng.integers(0, c, (1, n)), jnp.int32),
    )
    with neighbor_mode("windowed"):
        model = PointConvResNet(n_classes=c, use_crf=True, steps=1)
        state = create_train_state(
            model,
            build_windowed_batch(raw, jax.random.PRNGKey(0)),
            make_optimizer(lr=0.01),
        )
        tstep = make_train_step(model, windowed=True, curve_jitter=True)
        state1, m1 = tstep(state, raw, jax.random.PRNGKey(1))
        state2, m2 = tstep(state1, raw, jax.random.PRNGKey(2))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
