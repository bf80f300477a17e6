"""Dense-batched point convolution U-Net — the flagship model family.

TPU-native re-design of the reference "big" family
(models/point_conv_big.py): a 5-stage encoder of bottleneck residual
point-conv blocks over a precomputed ¼-rate index pyramid, a decoder of
continuous-CRF (or plain upsampling) blocks, and a dropout-MLP
classifier.  Every op is a static-shape gather or dense matmul.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from crfconv_tpu.data.batch import PointBatch
from crfconv_tpu.models.common import MLP, leaky_relu001, leaky_relu01
from crfconv_tpu.models.crf_conv import ContinuousCRFConv
from crfconv_tpu.ops.neighbors import gather_neighbors, upsample_nearest


class PointConv(nn.Module):
    """Continuous point convolution with MLP-generated neighbor weights.

    For each output point, gathers K neighbor features and combines them
    with depthwise weights produced by an MLP on the relative positions
    ``pos_i − pos_j``.  Symmetric (same-scale) when ``sub_pos is None``,
    strided/bipartite otherwise.  Reference: models/point_conv_big.py:8-58.
    """

    d_model: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                 # [B, N, F_in] fine-scale features
        pos: jnp.ndarray,               # [B, N, 3] fine-scale positions
        neighbor_idx: jnp.ndarray,      # [B, M, K] indices into N
        sub_pos: Optional[jnp.ndarray] = None,  # [B, M, 3] coarse positions
        extra: Optional[jnp.ndarray] = None,    # [B, N, E] rider tensor
        train: bool = True,
    ):
        d = x.shape[-1]
        mlp0 = MLP(self.d_model, activation=leaky_relu01, name="weight_nn_0")
        mlp1 = MLP(self.d_model, activation=None, name="weight_nn_1")

        from crfconv_tpu.ops import conv_pallas
        from crfconv_tpu.ops.neighbors import get_neighbor_mode

        mode = get_neighbor_mode()
        if conv_pallas.fused_eligible(
            train, sub_pos, extra, self.d_model, neighbor_idx.shape[1],
            neighbor_idx.shape[-1], mode,
        ):
            # eval-mode fused kernel: gather + rel + weight MLP (BN folded
            # to affine) + K-reduction (and the strided residual max-pool
            # rider) in one Pallas pass — nothing [B,N,K,*]-shaped touches
            # HBM.  Declare the SAME submodules on a dummy so the param
            # tree (and checkpoints) are identical to the unfused path,
            # then read their folded values.
            dummy = jnp.zeros((1, 1, 1, 3), x.dtype)
            _ = mlp1(mlp0(dummy, train=False), train=False)
            v0p, v0s = mlp0.variables["params"], mlp0.variables["batch_stats"]
            v1p, v1s = mlp1.variables["params"], mlp1.variables["batch_stats"]

            def fold(vp, vs):
                bn = vp["MaskedBatchNorm_0"]
                st = vs["MaskedBatchNorm_0"]
                a = bn["scale"] / jnp.sqrt(st["var"] + 1e-5)
                return vp["Dense_0"]["kernel"], a, bn["bias"] - st["mean"] * a

            w0, a0, c0 = fold(v0p, v0s)
            w1, a1, c1 = fold(v1p, v1s)

            from crfconv_tpu.ops import spatial_state

            if spatial_state.current() is not None:
                # point-sharded forward: run the same kernel on the
                # halo-extended frame (exact; parallel/spatial_forward)
                from crfconv_tpu.parallel.spatial_forward import (
                    spatial_point_conv_fused,
                )

                out = spatial_point_conv_fused(
                    x, pos, sub_pos, neighbor_idx, extra,
                    (w0, a0, c0, w1, a1, c1),
                    tile=mode["tile"], pad=mode["pad"],
                )
                if out is not None:
                    return out
                # infeasible halo → fall through to the unfused funnel
            elif extra is None:
                return conv_pallas.point_conv_fused_infer(
                    x, pos, neighbor_idx, w0, a0, c0, w1, a1, c1,
                    tile=mode["tile"], pad=mode["pad"],
                    interpret=conv_pallas.FUSED_INTERPRET,
                )
            else:
                return conv_pallas.point_conv_fused_strided(
                    x, pos, sub_pos, neighbor_idx, extra,
                    w0, a0, c0, w1, a1, c1,
                    tile=mode["tile"], pad=mode["pad"],
                    interpret=conv_pallas.FUSED_INTERPRET,
                )

        if conv_pallas.train_fused_eligible(
            train, sub_pos, extra, self.d_model, neighbor_idx.shape[1],
            neighbor_idx.shape[-1], mode,
        ):
            # TRAIN-mode fused contraction (VERDICT r4 #3): the weight
            # MLP + BatchNorm run in flax on the gathered relative
            # positions (exact train-mode batch statistics, identical
            # param tree and batch_stats updates to the unfused path),
            # while the expensive part — gathering [B,N,K,H] neighbor
            # features and contracting over K — runs in one Pallas pass
            # with a fused-scatter backward (weighted_gather_reduce).
            from crfconv_tpu.ops.windowed import weighted_gather_reduce

            nbr = gather_neighbors(pos, neighbor_idx)       # [B,N,K,3]
            rel = pos[:, :, None, :] - nbr
            w = mlp0(rel, train=train)
            w = mlp1(w, train=train)                        # [B,N,K,d]
            return weighted_gather_reduce(
                x, w, neighbor_idx, mode["tile"], mode["pad"]
            )

        # One fused gather for [pos, x(, extra)]: TPU gather cost is bound
        # by the index count, not the row width, so widening the gathered
        # row is free and removes 1-2 extra gathers from this block.  The
        # optional ``extra`` rider returns its gathered neighbors for the
        # caller (the strided residual max-pool shares these indices).
        parts = [pos, x] if extra is None else [pos, x, extra]
        g = gather_neighbors(jnp.concatenate(parts, axis=-1), neighbor_idx)
        neighbors = g[..., :3]
        xn = g[..., 3 : 3 + d]
        center = pos if sub_pos is None else sub_pos
        rel = center[:, :, None, :] - neighbors               # [B, M, K, 3]
        w = mlp0(rel, train=train)
        w = mlp1(w, train=train)                              # [B, M, K, d]
        out = jnp.sum(w * xn, axis=2)                         # [B, M, d]
        if extra is None:
            return out
        # rider contract: the POOLED max over K (so the fused-kernel path,
        # which never materializes [B, M, K, E], has the same signature)
        return out, jnp.max(g[..., 3 + d :], axis=2)          # [B, M, E]


class ResNetBBlock(nn.Module):
    """Bottleneck residual block: lin_in → PointConv → lin_out + shortcut.

    The strided variant max-pools the residual over ``sub_idx``.
    Reference: models/point_conv_big.py:61-88.
    """

    features: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos: jnp.ndarray,
        neighbor_idx: jnp.ndarray,
        sub_pos: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        hidden = self.features // 4
        in_features = x.shape[-1]
        if in_features != self.features:
            residual = MLP(self.features, activation=None, name="shortcut")(
                x, train=train
            )
        else:
            residual = x

        h = MLP(hidden, activation=leaky_relu01, name="lin_in")(x, train=train)
        if sub_pos is not None:
            # fuse the strided residual max-pool gather into the conv gather
            h, residual = PointConv(hidden, name="point_conv")(
                h, pos, neighbor_idx, sub_pos=sub_pos, extra=residual,
                train=train,
            )
        else:
            h = PointConv(hidden, name="point_conv")(
                h, pos, neighbor_idx, train=train
            )
        h = MLP(self.features, activation=None, name="lin_out")(h, train=train)
        # reference uses F.leaky_relu default slope (0.01) on the residual add
        return leaky_relu001(h + residual)


class Upsampling(nn.Module):
    """Non-CRF decoder block: 1-NN upsample, lin, concat-fuse with skip.

    Reference: models/point_conv_big.py:91-107.
    """

    up_features: int
    out_features: int

    @nn.compact
    def __call__(
        self,
        x_down: jnp.ndarray,        # [B, S, F_down] coarse features
        x_up: jnp.ndarray,          # [B, N, F_up] skip features
        up_idx: jnp.ndarray,        # [B, N, 1]
        neighbor_idx: Optional[jnp.ndarray] = None,  # unused; CRF-API parity
        train: bool = True,
    ) -> jnp.ndarray:
        del neighbor_idx
        x = upsample_nearest(x_down, up_idx[..., :1])
        x = MLP(self.up_features, activation=leaky_relu01, name="lin")(
            x, train=train
        )
        x = jnp.concatenate([x_up, x], axis=-1)
        return MLP(self.out_features, activation=leaky_relu01, name="fusion")(
            x, train=train
        )


class PointConvResNet(nn.Module):
    """The flagship encoder-decoder segmentation network ("PointConvBig").

    5-stage encoder (channels 32/64/128/256/512, two ResNet bottleneck
    blocks per stage), decoder of 4 CRF (or plain Upsampling) blocks, and
    a dropout-MLP classifier.  Consumes a :class:`PointBatch` whose
    ``scales`` pyramid was precomputed host-side.
    Reference: models/point_conv_big.py:110-167.
    """

    n_classes: int
    use_crf: bool = True
    steps: int = 1
    layers: Tuple[int, ...] = (32, 64, 128, 256, 512)
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self, batch: PointBatch, train: bool = True
    ) -> jnp.ndarray:
        ms = batch.scales
        L = self.layers
        x = batch.x

        # -------- encoder --------
        x1 = ResNetBBlock(L[0], name="conv1_1")(
            x, ms[0].pos, ms[0].neighbor_idx, train=train
        )
        x1 = ResNetBBlock(L[0], name="conv1_2")(
            x1, ms[0].pos, ms[0].neighbor_idx, train=train
        )

        x2 = ResNetBBlock(L[1], name="conv2_1")(
            x1, ms[0].pos, ms[0].sub_idx, sub_pos=ms[1].pos, train=train
        )
        x2 = ResNetBBlock(L[1], name="conv2_2")(
            x2, ms[1].pos, ms[1].neighbor_idx, train=train
        )

        x3 = ResNetBBlock(L[2], name="conv3_1")(
            x2, ms[1].pos, ms[1].sub_idx, sub_pos=ms[2].pos, train=train
        )
        x3 = ResNetBBlock(L[2], name="conv3_2")(
            x3, ms[2].pos, ms[2].neighbor_idx, train=train
        )

        x4 = ResNetBBlock(L[3], name="conv4_1")(
            x3, ms[2].pos, ms[2].sub_idx, sub_pos=ms[3].pos, train=train
        )
        x4 = ResNetBBlock(L[3], name="conv4_2")(
            x4, ms[3].pos, ms[3].neighbor_idx, train=train
        )

        x5 = ResNetBBlock(L[4], name="conv5_1")(
            x4, ms[3].pos, ms[3].sub_idx, sub_pos=ms[4].pos, train=train
        )
        x5 = ResNetBBlock(L[4], name="conv5_2")(
            x5, ms[4].pos, ms[4].neighbor_idx, train=train
        )

        # -------- decoder --------
        def deconv(i, out_f, x_down, x_up, scale):
            if self.use_crf:
                block = ContinuousCRFConv(
                    out_features=out_f, steps=self.steps, name=f"deconv{i}"
                )
            else:
                block = Upsampling(
                    up_features=out_f, out_features=out_f, name=f"deconv{i}"
                )
            return block(
                x_down, x_up, scale.up_idx, scale.neighbor_idx, train=train
            )

        x = deconv(4, L[3], x5, x4, ms[3])
        x = deconv(3, L[2], x, x3, ms[2])
        x = deconv(2, L[1], x, x2, ms[1])
        x = deconv(1, L[0], x, x1, ms[0])

        # -------- classifier --------
        x = MLP(L[0] * 4, activation=leaky_relu01, name="classifier_0")(
            x, train=train
        )
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(
            self.n_classes,
            name="classifier_1",
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"
            ),
        )(x)
        return x  # [B, N, n_classes] logits
