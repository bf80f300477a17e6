"""Discrete CRF head over class probabilities (CRF-as-RNN style).

Reference: models/discrete_crf_conv.py:11-63.  K learned Gaussian kernels
over input features produce edge weights w = exp(−‖f_i−f_j‖²)·W; the
mean-field loop is q ← softmax(−u − (Σ_j w q_j) C) with u = −log p and a
label-compatibility matrix C initialized to identity.  The reference's
per-call ``radius_graph(r=0.2, max_neighbors=32)`` becomes a precomputed
kNN(32) with a radius mask (SURVEY.md §7 design translation).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from crfconv_tpu.models.crf_conv import eye_init
from crfconv_tpu.ops.crf import discrete_crf_update
from crfconv_tpu.ops.neighbors import gather_neighbors, remove_self_loop


class DiscreteCRFConv(nn.Module):
    n_classes: int        # L
    feat_features: int    # D (raw input feature dimension)
    hidden_features: int = 64   # H
    num_kernels: int = 5        # number of Gaussian kernels
    radius: float = 0.2
    steps: int = 5

    @nn.compact
    def __call__(
        self,
        pos: jnp.ndarray,            # [B, N, 3]
        p: jnp.ndarray,              # [B, N, L] input probabilities
        f: jnp.ndarray,              # [B, N, D] raw guidance features
        neighbor_idx: jnp.ndarray,   # [B, N, K] self-inclusive kNN
        mask: Optional[jnp.ndarray] = None,  # [B, N] point validity
        train: bool = True,
    ) -> jnp.ndarray:
        F_k = self.param(
            "F",
            nn.initializers.uniform(scale=1.0),
            (self.num_kernels, self.feat_features, self.hidden_features),
        )
        W = self.param(
            "W",
            lambda k, s: jnp.full(s, 1.0 / self.num_kernels),
            (self.num_kernels, 1),
        )
        compat = self.param("C", eye_init, (self.n_classes, self.n_classes))

        nidx = remove_self_loop(neighbor_idx)

        u = -jnp.log(jnp.maximum(p, 1e-12))            # unary

        # kernel embeddings: [B, N, Kk, H]
        emb = jnp.einsum("bnd,kdh->bnkh", f, F_k)
        emb_n = gather_neighbors(
            emb.reshape(emb.shape[0], emb.shape[1], -1), nidx
        ).reshape(nidx.shape + emb.shape[2:])          # [B, N, Kn, Kk, H]
        diff = emb[:, :, None, :, :] - emb_n
        w = jnp.exp(-jnp.sum(diff * diff, axis=-1))    # [B, N, Kn, Kk]
        w = jnp.squeeze(w @ W, -1)                     # [B, N, Kn]

        # radius mask: only neighbors within r contribute (radius_graph parity)
        npos = gather_neighbors(pos, nidx)
        d2 = jnp.sum(jnp.square(pos[:, :, None, :] - npos), axis=-1)
        nmask = d2 <= self.radius * self.radius
        if mask is not None:
            valid_n = gather_neighbors(
                mask.astype(jnp.float32)[..., None], nidx
            )[..., 0].astype(bool)
            nmask = nmask & valid_n & mask[:, :, None]

        # fused in BOTH train and eval: discrete_crf_core's VJP is the
        # native fused reverse recurrence (crf_pallas._bwd_discrete_kernel)
        return discrete_crf_update(
            p, u, w, nidx, compat, steps=self.steps, mask=nmask,
            allow_fused=True,
        )
