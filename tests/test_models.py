"""Forward-pass and jit-stability tests for all model families."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crfconv_tpu.data.pipeline import synthetic_batch
from crfconv_tpu.models import (
    BaselineDiscreteCRFSegNet,
    BaselineSegNet,
    CRFSegNet,
    CRFSegNet_Part,
    DualCRFSegNet,
    PointConvResNet,
    get_model,
)

B, N, C_IN, N_CLASSES = 2, 512, 6, 13


@pytest.fixture(scope="module")
def big_batch():
    return synthetic_batch(B, N, C_IN, N_CLASSES, seed=0)


@pytest.fixture(scope="module")
def small_batch():
    # small family interpolates with k_up=3
    return synthetic_batch(B, N, C_IN, N_CLASSES, k_up=3, seed=1,
                           with_category=True)


class TestBigFamily:
    @pytest.mark.parametrize("use_crf", [True, False])
    def test_forward_shapes(self, big_batch, use_crf):
        model = PointConvResNet(n_classes=N_CLASSES, use_crf=use_crf, steps=2)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            big_batch,
            train=False,
        )
        out = model.apply(variables, big_batch, train=False)
        assert out.shape == (B, N, N_CLASSES)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_train_mode_updates_batch_stats(self, big_batch):
        model = PointConvResNet(n_classes=N_CLASSES, use_crf=True, steps=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            big_batch,
            train=True,
        )
        out, updates = model.apply(
            variables,
            big_batch,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        assert out.shape == (B, N, N_CLASSES)
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )

    def test_jit_no_retrace(self, big_batch):
        model = PointConvResNet(n_classes=N_CLASSES, use_crf=True, steps=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            big_batch,
            train=False,
        )
        traces = 0

        @jax.jit
        def fwd(v, b):
            nonlocal traces
            traces += 1
            return model.apply(v, b, train=False)

        fwd(variables, big_batch)
        # second call with fresh (same-shape) data must reuse the trace
        batch2 = synthetic_batch(B, N, C_IN, N_CLASSES, seed=7)
        fwd(variables, batch2)
        assert traces == 1


class TestSmallFamily:
    @pytest.mark.parametrize(
        "cls,kwargs",
        [
            (BaselineSegNet, {"n_classes": N_CLASSES}),
            (CRFSegNet, {"n_classes": N_CLASSES, "steps": 2}),
        ],
    )
    def test_logsoftmax_output(self, small_batch, cls, kwargs):
        model = cls(**kwargs)
        variables = model.init(jax.random.PRNGKey(0), small_batch, train=False)
        out = model.apply(variables, small_batch, train=False)
        assert out.shape == (B, N, N_CLASSES)
        # log-softmax rows sum to 1 in prob space
        np.testing.assert_allclose(
            np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-4
        )

    def test_part_seg_with_category(self, small_batch):
        model = CRFSegNet_Part(n_classes=50, steps=1)
        variables = model.init(jax.random.PRNGKey(0), small_batch, train=False)
        out = model.apply(variables, small_batch, train=False)
        assert out.shape == (B, N, 50)

    @pytest.mark.parametrize("cls", [BaselineDiscreteCRFSegNet, DualCRFSegNet])
    def test_dual_heads(self, small_batch, cls):
        model = cls(n_classes=N_CLASSES, steps=2)
        variables = model.init(jax.random.PRNGKey(0), small_batch, train=False)
        log_p, log_q = model.apply(variables, small_batch, train=False)
        assert log_p.shape == (B, N, N_CLASSES)
        assert log_q.shape == (B, N, N_CLASSES)
        np.testing.assert_allclose(
            np.exp(np.asarray(log_q)).sum(-1), 1.0, rtol=1e-3
        )


class TestRegistry:
    def test_get_model(self):
        m = get_model("PointConvBig", n_classes=8, use_crf=True, steps=1)
        assert isinstance(m, PointConvResNet)

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_model("NoSuchModel")


class TestEdgeListCRFTwin:
    """The literal edge-list-API twin (reference
    continuous_crf_conv.py:72-133, dead code there) — golden parity vs a
    numpy re-execution of the reference math on the same edge list."""

    def test_matches_reference_math(self):
        import jax
        import numpy as np
        import jax.numpy as jnp

        from crfconv_tpu.models import EdgeListContinuousCRFConv

        rng = np.random.default_rng(0)
        n, e, cu, cp, steps = 64, 400, 8, 16, 3
        x = rng.standard_normal((n, cu)).astype(np.float32)
        y = rng.standard_normal((n, cp)).astype(np.float32)
        pos = rng.random((n, 3)).astype(np.float32)
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        edge_index = np.stack([dst, src]).astype(np.int32)

        model = EdgeListContinuousCRFConv(
            unary_channels=cu, pairwise_channels=cp, steps=steps,
            max_degree=32,
        )
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(pos),
            jnp.asarray(edge_index), train=True,
        )
        out, _ = model.apply(
            vars_, jnp.asarray(x), jnp.asarray(y), jnp.asarray(pos),
            jnp.asarray(edge_index), train=True,
            mutable=["batch_stats"],
        )
        out = np.asarray(out)

        # ---- numpy re-execution of the reference forward ----
        p = vars_["params"]

        def lin_bn(v, a):
            h = a @ np.asarray(v["Dense_0"]["kernel"])
            mean = h.mean(0)
            var = h.var(0)
            return (h - mean) / np.sqrt(var + 1e-5)

        def lin_bn_act(v, a):
            h = lin_bn(v, a)
            return np.where(h >= 0, h, 0.01 * h)

        xu = lin_bn(p["unary_net"], x)
        s_f = lin_bn(p["pairwise_net"], y)
        i, j = edge_index
        d = ((s_f[i] - s_f[j]) ** 2).sum(-1)
        # per-destination softmax over incoming edges
        s_edge = np.zeros(e)
        for node in range(n):
            m = i == node
            if m.any():
                z = -d[m]
                z = np.exp(z - z.max())
                s_edge[m] = z / z.sum()
        C = np.asarray(p["c"]).T @ np.asarray(p["c"])
        inv = np.linalg.inv(np.eye(C.shape[0]) + C)
        z = xu.copy()
        h = xu.copy()
        for _ in range(steps):
            msg = np.zeros_like(h)
            np.add.at(msg, i, s_edge[:, None] * h[j])
            h = (z + msg @ C) @ inv
        ref = lin_bn_act(p["mlp"], h)
        ref = lin_bn_act(
            p["fusion_net"], np.concatenate([ref, y], axis=-1)
        )
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)
