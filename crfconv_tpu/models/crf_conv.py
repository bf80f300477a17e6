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

        c = self.param("c", eye_init, (hidden, hidden))

        from crfconv_tpu.ops import crf_sim_pallas, spatial_state
        from crfconv_tpu.ops.neighbors import get_neighbor_mode

        mode = get_neighbor_mode()
        handled = False
        if crf_sim_pallas.sim_eligible(train, hidden, nidx.shape[1], mode):
            # eval-mode fused setup: window DMA of [y|z], Gaussian
            # similarity softmax, and the first message Σ_k s·z_k in one
            # Pallas pass — the decoder's [B,N,K,2H] guidance gather
            # never touches HBM (VERDICT r3 #4)
            if spatial_state.current() is None:
                msg0, s = crf_sim_pallas.crf_similarity_message(
                    y, x, nidx, tile=mode["tile"], pad=mode["pad"],
                    interpret=crf_sim_pallas.SIM_INTERPRET,
                )
                x = crf_mean_field(
                    x, s, nidx, c, steps=self.steps, msg0=msg0,
                    allow_fused=True,
                )
                handled = True
            else:
                # point-sharded: the kernel runs on the halo-extended
                # frame (parallel/spatial_forward), the chunked halo
                # iteration consumes the trimmed s
                from crfconv_tpu.parallel.spatial_forward import (
                    spatial_crf_similarity,
                )

                r = spatial_crf_similarity(
                    y, x, nidx, mode["tile"], mode["pad"]
                )
                if r is not None:
                    _, s = r
                    x = crf_mean_field(
                        x, s, nidx, c, steps=self.steps, allow_fused=True
                    )
                    handled = True
        if not handled:
            # one fused gather of [y, z] — similarity guidance and the
            # first mean-field message share the same neighbor indices
            from crfconv_tpu.ops.neighbors import gather_neighbors

            g = gather_neighbors(jnp.concatenate([y, x], axis=-1), nidx)
            yn, zn = g[..., :hidden], g[..., hidden:]
            s = gaussian_similarity(y, nidx, neighbors=yn)  # [B, N, K-1]

            # allow_fused=True even in training: the fused kernel has a
            # NATIVE fused VJP (crf_pallas.crf_core — the iteration is
            # linear, so its transpose is the same banded recurrence),
            # 20x faster than the scan VJP at steps=10 on v5e
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


def edges_to_padded(edge_index, num_nodes: int, max_degree: int):
    """Edge list [2, E] (rows: destination i, source j) → padded dense
    neighbor lists [num_nodes, max_degree] int32 + validity mask.

    Neighbors beyond ``max_degree`` per destination are dropped (matching
    torch's arbitrary-order truncation semantics for over-full
    neighborhoods, SURVEY.md §7 hard part #4); slots keep edge order.
    """
    i, j = edge_index[0], edge_index[1]
    order = jnp.argsort(i, stable=True)
    i_s = i[order].astype(jnp.int32)
    j_s = j[order].astype(jnp.int32)
    starts = jnp.searchsorted(i_s, jnp.arange(num_nodes, dtype=i_s.dtype))
    rank = jnp.arange(i_s.shape[0], dtype=jnp.int32) - starts[i_s]
    keep = rank < max_degree
    slot = jnp.where(
        keep, i_s * max_degree + rank, num_nodes * max_degree
    )
    nbr = (
        jnp.zeros((num_nodes * max_degree + 1,), jnp.int32)
        .at[slot].set(j_s, mode="drop")[:-1]
        .reshape(num_nodes, max_degree)
    )
    mask = (
        jnp.zeros((num_nodes * max_degree + 1,), bool)
        .at[slot].set(keep, mode="drop")[:-1]
        .reshape(num_nodes, max_degree)
    )
    return nbr, mask


class EdgeListContinuousCRFConv(nn.Module):
    """Literal API twin of the reference's edge-list
    ``ContinuousGaussianCRFConv`` (models/continuous_crf_conv.py:72-133 —
    defined but unused by any reference model; provided for 100%
    component-inventory parity).  A thin adapter: the edge list is
    padded to dense [N, K] neighbor lists and the math runs through the
    same masked dense ops as the flagship (gaussian_similarity +
    crf_mean_field), which reproduce the reference's per-destination
    edge softmax and scatter_add mean-field exactly.

    ``__call__(x, y, pos, edge_index)`` mirrors the reference forward:
    x [N, C_u] unary input, y [N, C_p] pairwise/guide input, pos [N, 3]
    (used only for N), edge_index [2, E] with rows (dst i, src j).
    """

    unary_channels: int          # kept for ctor parity (shape-checked)
    pairwise_channels: int
    hidden_channels: Optional[int] = None
    out_channels: Optional[int] = None
    steps: int = 1
    max_degree: int = 32

    @nn.compact
    def __call__(self, x, y, pos, edge_index, train: bool = True):
        out_c = (
            self.out_channels
            if self.out_channels is not None
            else self.pairwise_channels
        )
        hidden = (
            self.hidden_channels
            if self.hidden_channels is not None
            else out_c // 4
        )
        assert x.shape[-1] == self.unary_channels
        assert y.shape[-1] == self.pairwise_channels
        n = pos.shape[0]
        nbr, mask = edges_to_padded(edge_index, n, self.max_degree)

        xu = MLP(hidden, activation=None, name="unary_net")(x, train=train)
        s_feat = MLP(hidden, activation=None, name="pairwise_net")(
            y, train=train
        )
        # batch-of-one dense layout for the shared ops
        xu_b = xu[None]
        s_b = s_feat[None]
        nbr_b = nbr[None]
        mask_b = mask[None]
        s = gaussian_similarity(s_b, nbr_b, mask=mask_b)
        c = self.param("c", eye_init, (hidden, hidden))
        out = crf_mean_field(xu_b, s, nbr_b, c, steps=self.steps)[0]

        out = MLP(out_c, activation=leaky_relu001, name="mlp")(
            out, train=train
        )
        out = jnp.concatenate([out, y], axis=-1)
        return MLP(out_c, activation=leaky_relu001, name="fusion_net")(
            out, train=train
        )
