"""Predictor serving API: single-device and point-sharded flavors agree
with each other and with a hand-rolled windowed forward."""

from __future__ import annotations

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from crfconv_tpu.data.batch import PointBatch
from crfconv_tpu.models import PointConvResNet
from crfconv_tpu.ops.neighbors import neighbor_mode
from crfconv_tpu.ops.windowed import build_pyramid_windowed
from crfconv_tpu.parallel import make_mesh
from crfconv_tpu.serve import Predictor


class TestPredictor:
    def _setup(self, n):
        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.random((1, n, 3), dtype=np.float32))
        feats = jnp.asarray(rng.random((1, n, 4), dtype=np.float32))
        model = PointConvResNet(
            n_classes=5, use_crf=True, steps=1, layers=(8, 16, 32, 64, 128)
        )
        with neighbor_mode("windowed"):
            order, scales = build_pyramid_windowed(
                pos, key=jax.random.PRNGKey(0)
            )
            x = jnp.take_along_axis(feats, order[..., None], axis=1)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                PointBatch(x=x, y=None, scales=scales), train=False,
            )
            ref_sorted = model.apply(
                variables, PointBatch(x=x, y=None, scales=scales),
                train=False,
            )
            ref = jnp.take_along_axis(
                ref_sorted, jnp.argsort(order, axis=1)[..., None], axis=1
            )
        return model, variables, pos, feats, ref

    def test_single_device_matches_manual(self):
        model, variables, pos, feats, ref = self._setup(4096)
        with neighbor_mode("windowed"):
            p = Predictor(model, variables)
            logits = p.predict_logits(pos, feats)
            labels = p.predict(pos, feats)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref), rtol=0, atol=2e-5
        )
        assert labels.shape == (1, 4096)

    @pytest.mark.slow
    def test_spatial_matches_single(self):
        model, variables, pos, feats, ref = self._setup(16384)
        mesh = make_mesh(8)
        with neighbor_mode("windowed"):
            p = Predictor(model, variables, mesh=mesh)
            logits = p.predict_logits(pos, feats)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref), rtol=0, atol=2e-5
        )
        assert p.spatial_info["sharded_scales"] == [16384, 4096]
