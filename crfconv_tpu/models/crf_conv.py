"""Continuous Gaussian CRF decoder blocks.

``ContinuousCRFConv`` is the dense flagship variant (reference
models/continuous_crf_conv_big.py:7-78): unary MLP on coarse features,
pairwise MLP on skip features, 1-NN upsample, Gaussian similarity over K
spatial neighbors, and the closed-form mean-field loop with learned PSD
compatibility C = cᵀc, followed by an output MLP and concat-fusion with
the skip features.

``GuideCRFConv`` is the edge-list "small"-family variant (reference
models/continuous_crf_conv.py:9-69) re-expressed on padded kNN indices
with an optional radius mask: linear+BN unary/pairwise heads, same loop,
LeakyReLU output, no fusion.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from crfconv_tpu.models.common import MLP, leaky_relu001, leaky_relu01
from crfconv_tpu.ops.crf import crf_mean_field, gaussian_similarity
from crfconv_tpu.ops.neighbors import remove_self_loop, upsample_nearest


def eye_init(key, shape, dtype=jnp.float32):
    del key
    return jnp.eye(shape[0], dtype=dtype)


class ContinuousCRFConv(nn.Module):
    """Dense continuous Gaussian CRF decoder (the core op of the framework)."""

    out_features: int
    steps: int = 1

    @nn.compact
    def __call__(
        self,
        unary: jnp.ndarray,          # [B, S, F_unary] coarse features
        pairwise: jnp.ndarray,       # [B, N, F_pair] skip features (F_pair == out_features)
        up_idx: jnp.ndarray,         # [B, N, 1] 1-NN coarse index per fine point
        neighbor_idx: jnp.ndarray,   # [B, N, K] self-inclusive kNN at the fine scale
        train: bool = True,
    ) -> jnp.ndarray:
        hidden = self.out_features // 4
        # self-loop excluded from message passing (reference :45-47)
        nidx = remove_self_loop(neighbor_idx)

        x = MLP(hidden, activation=leaky_relu01, name="unary_nn_0")(
            unary, train=train
        )
        x = MLP(hidden, activation=None, name="unary_nn_1")(x, train=train)

        y = MLP(hidden, activation=leaky_relu01, name="pairwise_nn_0")(
            pairwise, train=train
        )
        y = MLP(hidden, activation=None, name="pairwise_nn_1")(y, train=train)

        x = upsample_nearest(x, up_idx[..., :1])     # [B, N, hidden]

        # one fused gather of [y, z] — similarity guidance and the first
        # mean-field message share the same neighbor indices
        from crfconv_tpu.ops.neighbors import gather_neighbors

        g = gather_neighbors(jnp.concatenate([y, x], axis=-1), nidx)
        yn, zn = g[..., :hidden], g[..., hidden:]
        s = gaussian_similarity(y, nidx, neighbors=yn)   # [B, N, K-1]

        c = self.param("c", eye_init, (hidden, hidden))
        # allow_fused=True even in training: the fused kernel has a
        # NATIVE fused VJP (crf_pallas.crf_core — the iteration is
        # linear, so its transpose is the same banded recurrence), 20x
        # faster than the scan VJP at steps=10 on v5e
        x = crf_mean_field(
            x, s, nidx, c, steps=self.steps, neighbors0=zn,
            allow_fused=True,
        )

        x = MLP(self.out_features, activation=leaky_relu01, name="out_nn")(
            x, train=train
        )
        x = jnp.concatenate([x, pairwise], axis=-1)
        return MLP(self.out_features, activation=leaky_relu01, name="fusion_nn")(
            x, train=train
        )


class GuideCRFConv(nn.Module):
    """Edge-list-family continuous CRF on padded kNN + optional radius mask.

    The reference builds ``radius_graph(r, max_num_neighbors=K)`` per call
    (models/continuous_crf_conv.py:53); here the identical support is a
    precomputed kNN(K) with neighbors beyond ``radius`` masked out of the
    similarity softmax (SURVEY.md §7 design translation).
    """

    out_features: int
    steps: int = 1
    radius: Optional[float] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,              # [B, N, F_x] features to refine (unary input)
        y: jnp.ndarray,              # [B, N, F_y] guidance features
        pos: jnp.ndarray,            # [B, N, 3] positions (for the radius mask)
        neighbor_idx: jnp.ndarray,   # [B, N, K] self-inclusive kNN
        mask: Optional[jnp.ndarray] = None,  # [B, N] point validity
        train: bool = True,
    ) -> jnp.ndarray:
        nidx = remove_self_loop(neighbor_idx)

        xh = MLP(self.out_features, activation=None, name="unary")(
            x, train=train, mask=mask
        )
        yh = MLP(self.out_features, activation=leaky_relu001, name="pairwise")(
            y, train=train, mask=mask
        )

        from crfconv_tpu.ops.neighbors import gather_neighbors as _gather

        nmask = None
        if self.radius is not None:
            npos = _gather(pos, nidx)
            d2 = jnp.sum(
                jnp.square(pos[:, :, None, :] - npos), axis=-1
            )
            nmask = d2 <= self.radius * self.radius
        if mask is not None:
            valid_n = _gather(
                mask.astype(jnp.float32)[..., None], nidx
            )[..., 0] > 0.5
            nmask = valid_n if nmask is None else (nmask & valid_n)

        s = gaussian_similarity(yh, nidx, mask=nmask)
        c = self.param("c", eye_init, (self.out_features, self.out_features))
        out = crf_mean_field(
            xh, s, nidx, c, steps=self.steps, allow_fused=True
        )
        return leaky_relu001(out)
