"""Segmentation network wrappers (the reference's public model registry).

Reference: models/point_conv.py:491-618.  Each wrapper pairs a feature
extractor with a classifier head; the dual-CRF variants additionally run a
discrete CRF over the predicted probabilities and return a tuple
``(log p, log q)`` for dual-loss training (reference :567, :618).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from crfconv_tpu.data.batch import PointBatch
from crfconv_tpu.models.common import torch_linear_kernel_init
from crfconv_tpu.models.discrete_crf import DiscreteCRFConv
from crfconv_tpu.models.point_conv_small import SmallBaselineNet, SmallCRFNet

NUM_SHAPENET_CATEGORIES = 16

# the discrete CRF's neighborhood matches the reference's dedicated
# radius_graph(r=0.2, max_num_neighbors=32) built per call
# (models/discrete_crf_conv.py:44): kNN(32) + the radius mask inside
# DiscreteCRFConv, independent of the encoder pyramid's K.
DISCRETE_CRF_K = 32


def _discrete_crf_idx(pos):
    """Self-inclusive kNN(32) at the finest scale, rebuilt per forward
    exactly as the reference rebuilds its graph; window-consistent in the
    windowed regime so downstream gathers stay valid."""
    from crfconv_tpu.ops.neighbors import get_neighbor_mode, knn_bruteforce

    k = min(DISCRETE_CRF_K, pos.shape[1])
    mode = get_neighbor_mode()
    if mode["mode"] == "windowed":
        from crfconv_tpu.ops import spatial_state
        from crfconv_tpu.ops.windowed import window_knn

        ctx = spatial_state.current()
        if ctx is not None:
            # point-sharded forward: in-model kNN must run halo-exchanged
            # so the indices come out in the global frame
            fr = ctx["frames"].get(pos.shape[1])
            if fr is not None and fr[0]:
                from crfconv_tpu.parallel.spatial_build import _knn_local

                return _knn_local(
                    pos, k, ns_g=fr[1], axis=ctx["axis"],
                    ndev=ctx["ndev"], tile=mode["tile"], pad=mode["pad"],
                )
            with spatial_state.suspend():
                return window_knn(pos, k, tile=mode["tile"], pad=mode["pad"])
        return window_knn(pos, k, tile=mode["tile"], pad=mode["pad"])
    return knn_bruteforce(pos, pos, k)


class _Classifier(nn.Module):
    """ReLU-MLP classifier head: Dense(hidden) → ReLU → Dense(n_classes)."""

    hidden: int
    n_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.hidden, kernel_init=torch_linear_kernel_init, name="fc1"
        )(x)
        x = nn.relu(x)
        return nn.Dense(
            self.n_classes, kernel_init=torch_linear_kernel_init, name="fc2"
        )(x)


class BaselineSegNet(nn.Module):
    """Small baseline net + classifier; log-softmax output.

    Reference: models/point_conv.py:523-542.
    """

    n_classes: int

    @nn.compact
    def __call__(self, batch: PointBatch, train: bool = True) -> jnp.ndarray:
        x = SmallBaselineNet(name="feature")(batch, train=train)
        x = _Classifier(128, self.n_classes, name="classifier")(x)
        return jax.nn.log_softmax(x, axis=-1)


class CRFSegNet(nn.Module):
    """Small continuous-CRF net + classifier; log-softmax output.

    Reference: models/point_conv.py:570-591.
    """

    n_classes: int
    steps: int = 1

    @nn.compact
    def __call__(self, batch: PointBatch, train: bool = True) -> jnp.ndarray:
        x = SmallCRFNet(steps=self.steps, name="feature")(batch, train=train)
        x = _Classifier(128, self.n_classes, name="classifier")(x)
        return jax.nn.log_softmax(x, axis=-1)


class CRFSegNet_Part(nn.Module):
    """ShapeNet part segmentation: CRF net + one-hot category conditioning.

    Reference: models/point_conv.py:491-515 (input = [pos, normals]; the
    16-way object-category one-hot is concatenated before the classifier).
    """

    n_classes: int = 50
    steps: int = 1

    @nn.compact
    def __call__(self, batch: PointBatch, train: bool = True) -> jnp.ndarray:
        x = SmallCRFNet(steps=self.steps, name="feature")(batch, train=train)
        onehot = jax.nn.one_hot(
            batch.category, NUM_SHAPENET_CATEGORIES, dtype=x.dtype
        )  # [B, 16]
        onehot = jnp.broadcast_to(
            onehot[:, None, :], x.shape[:2] + (NUM_SHAPENET_CATEGORIES,)
        )
        x = jnp.concatenate([x, onehot], axis=-1)
        x = _Classifier(256, self.n_classes, name="classifier")(x)
        return jax.nn.log_softmax(x, axis=-1)


class BaselineDiscreteCRFSegNet(nn.Module):
    """Baseline net + discrete CRF over probabilities → (log p, log q).

    Reference: models/point_conv.py:545-567.
    """

    n_classes: int
    steps: int = 1

    @nn.compact
    def __call__(
        self, batch: PointBatch, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = SmallBaselineNet(name="feature")(batch, train=train)
        logits = _Classifier(256, self.n_classes, name="classifier")(h)
        p = jax.nn.softmax(logits, axis=-1)
        q = DiscreteCRFConv(
            n_classes=self.n_classes,
            feat_features=batch.x.shape[-1],
            steps=self.steps,
            name="crf",
        )(
            batch.scales[0].pos,
            p,
            batch.x,
            _discrete_crf_idx(batch.scales[0].pos),
            train=train,
        )
        return jnp.log(jnp.maximum(p, 1e-12)), jnp.log(jnp.maximum(q, 1e-12))


class DualCRFSegNet(nn.Module):
    """Continuous-CRF net + discrete CRF head → (log p, log q).

    Reference: models/point_conv.py:594-618.
    """

    n_classes: int
    steps: int = 1

    @nn.compact
    def __call__(
        self, batch: PointBatch, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = SmallCRFNet(steps=self.steps, name="feature")(batch, train=train)
        logits = _Classifier(256, self.n_classes, name="classifier")(h)
        p = jax.nn.softmax(logits, axis=-1)
        q = DiscreteCRFConv(
            n_classes=self.n_classes,
            feat_features=batch.x.shape[-1],
            steps=self.steps,
            name="crf",
        )(
            batch.scales[0].pos,
            p,
            batch.x,
            _discrete_crf_idx(batch.scales[0].pos),
            train=train,
        )
        return jnp.log(jnp.maximum(p, 1e-12)), jnp.log(jnp.maximum(q, 1e-12))
