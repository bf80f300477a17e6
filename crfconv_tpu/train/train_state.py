"""Train state + jitted train/eval steps.

The optimizer reproduces the reference recipe (trainval.py:69-73):
SGD(lr, momentum=0.95, weight_decay=1e-4) with per-epoch exponential LR
decay — expressed as an optax chain whose update order matches torch SGD
(L2 folded into the gradient *before* the momentum trace).

The train step is a pure function over (state, batch, rng) and is jitted
once; under a device mesh the same function runs data-parallel with the
batch sharded on the mesh axis and gradients all-reduced by XLA over ICI
(see crfconv_tpu.parallel).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from crfconv_tpu.data.batch import PointBatch
from crfconv_tpu.train.losses import segmentation_loss
from crfconv_tpu.train.metrics import confusion_matrix_device


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )


def make_optimizer(
    lr: float,
    momentum: float = 0.95,
    weight_decay: float = 1e-4,
    gamma: float = 0.95,
    steps_per_epoch: int = 100,
) -> optax.GradientTransformation:
    """torch SGD(momentum, weight_decay) + per-epoch ExponentialLR."""
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=steps_per_epoch,
        decay_rate=gamma,
        staircase=True,
    )
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )


def create_train_state(
    model,
    example_batch: PointBatch,
    tx: optax.GradientTransformation,
    seed: int = 0,
) -> TrainState:
    # jit the init: eagerly it dispatches every primitive separately —
    # hundreds of round-trips through the remote compile helper on a
    # tunneled TPU; as one jitted program it is a single (cached) compile
    variables = jax.jit(
        lambda rngs, b: model.init(rngs, b, train=True)
    )(
        {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
        },
        example_batch,
    )
    return TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        tx=tx,
    )


def build_windowed_batch(
    raw,
    rng: jax.Array,
    curve_rot: Optional[jnp.ndarray] = None,
    curve_jitter: bool = False,
    return_order: bool = False,
) -> PointBatch:
    """Jittable: RawBatch → Morton-sorted PointBatch with a windowed
    pyramid (the full input structure is built on-device).  Geometry
    (tile/pad) follows set_neighbor_mode so the builder and every gather
    always agree on the windows.

    ``curve_rot`` fixes the curve orientation (multi-view eval);
    ``curve_jitter=True`` samples a uniform random orientation from
    ``rng`` instead — train-time augmentation that decorrelates the
    window-miss pattern across steps (VERDICT r3 #1)."""
    from crfconv_tpu.data.batch import RawBatch  # noqa: F401
    from crfconv_tpu.ops.morton import random_rotation
    from crfconv_tpu.ops.neighbors import get_neighbor_mode
    from crfconv_tpu.ops.windowed import build_pyramid_windowed

    if curve_jitter:
        rng, rk = jax.random.split(rng)
        curve_rot = random_rotation(rk)
    mode = get_neighbor_mode()
    order, scales = build_pyramid_windowed(
        raw.pos,
        key=rng,
        tile=mode["tile"],
        pad=mode["pad"],
        curve_rot=curve_rot,
    )
    take = lambda a: (
        None
        if a is None
        else jnp.take_along_axis(
            a if a.ndim == 3 else a[..., None], order[..., None], axis=1
        ).reshape(a.shape)
    )
    batch = PointBatch(
        x=take(raw.x),
        y=take(raw.y),
        scales=scales,
        point_idx=take(raw.point_idx),
        cloud_idx=raw.cloud_idx,
        category=raw.category,
    )
    if return_order:
        return batch, order
    return batch


def make_train_step(
    model,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: int = -1,
    label_offset: int = 0,
    windowed: bool = False,
    curve_jitter: bool = False,
) -> Callable:
    """Build the jittable train step for a model.

    label_offset reproduces the reference's ``y = data.y - 1`` shift for
    datasets whose label 0 means "unlabeled" (trainval.py:101).
    With ``windowed=True`` the step takes a RawBatch and builds the
    Morton-sorted windowed pyramid on-device; ``curve_jitter=True`` adds
    per-step random curve orientation (windowed regime only).
    """

    def train_step(
        state: TrainState, batch, rng: jax.Array
    ) -> Tuple[TrainState, dict]:
        if windowed:
            rng, pk = jax.random.split(rng)
            batch = build_windowed_batch(batch, pk, curve_jitter=curve_jitter)
        labels = batch.y - label_offset

        def loss_fn(params):
            outputs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            loss = segmentation_loss(
                outputs, labels, class_weights, ignore_index
            )
            return loss, (outputs, updates["batch_stats"])

        (loss, (outputs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        primary = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        preds = jnp.argmax(primary, axis=-1)
        n_classes = primary.shape[-1]
        confusion = confusion_matrix_device(
            labels, preds, n_classes, ignore_index
        )
        return new_state, {"loss": loss, "confusion": confusion}

    return train_step


def make_eval_step(
    model,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: int = -1,
    label_offset: int = 0,
    windowed: bool = False,
    eval_views: int = 1,
) -> Callable:
    """Build the jittable eval step.

    ``eval_views > 1`` (windowed regime only) averages softmax
    probabilities over that many forwards, each under a different fixed
    curve orientation (ops.morton.view_rotation).  Different orientations
    have nearly uncorrelated window-miss patterns (union recall 0.97 vs
    0.86 single at t64-p128), so the ensemble recovers the cross-tile
    edges any single windowed pass drops — the mechanism that closes the
    windowed regime's −0.8 pp cross-tile mIoU gap (VERDICT r3 #1) at
    ``eval_views ×`` the single-pass inference cost.  Outputs are in RAW
    (unsorted) point order in this mode."""

    def multi_view_eval(state: TrainState, raw, rng: jax.Array) -> dict:
        from crfconv_tpu.ops.morton import view_rotation

        labels = raw.y - label_offset
        b_ix = None
        probs_sum = None
        loss_sum = 0.0
        for v in range(eval_views):
            vb, order = build_windowed_batch(
                raw,
                jax.random.fold_in(rng, v),
                curve_rot=view_rotation(v),
                return_order=True,
            )
            outputs = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                vb,
                train=False,
            )
            primary = (
                outputs[-1] if isinstance(outputs, (tuple, list)) else outputs
            )
            loss_sum = loss_sum + segmentation_loss(
                outputs, vb.y - label_offset, class_weights, ignore_index
            )
            p = jax.nn.softmax(primary, axis=-1)
            if b_ix is None:
                b_ix = jnp.arange(p.shape[0], dtype=jnp.int32)[:, None]
            # un-permute back to raw point order: sorted row i is raw
            # point order[i]
            p_raw = jnp.zeros_like(p).at[b_ix, order].set(
                p, mode="promise_in_bounds"
            )
            probs_sum = p_raw if probs_sum is None else probs_sum + p_raw
        probs = probs_sum / eval_views
        preds = jnp.argmax(probs, axis=-1)
        confusion = confusion_matrix_device(
            labels, preds, probs.shape[-1], ignore_index
        )
        return {
            "loss": loss_sum / eval_views,
            "confusion": confusion,
            "probs": probs,
            "preds": preds,
            "point_idx": raw.point_idx,
            "labels": raw.y,
        }

    def eval_step(state: TrainState, batch, rng: Optional[jax.Array] = None) -> dict:
        if windowed and eval_views > 1:
            if rng is None:
                rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            return multi_view_eval(state, batch, rng)
        if windowed:
            # pyramid key: explicit rng if the caller provides one (the
            # Trainer's vote loop passes a per-pass key so each vote sees
            # a different stratified subsample), otherwise derived from
            # the train step — deterministic, but still varied across
            # checkpoints.
            if rng is None:
                rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            batch = build_windowed_batch(batch, rng)
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            train=False,
        )
        primary = outputs[-1] if isinstance(outputs, (tuple, list)) else outputs
        labels = batch.y - label_offset
        loss = segmentation_loss(outputs, labels, class_weights, ignore_index)
        preds = jnp.argmax(primary, axis=-1)
        probs = jax.nn.softmax(primary, axis=-1)
        confusion = confusion_matrix_device(
            labels, preds, primary.shape[-1], ignore_index
        )
        return {
            "loss": loss,
            "confusion": confusion,
            "probs": probs,
            "preds": preds,
            # probs are aligned to the (possibly Morton-sorted) batch
            # order; expose the matching original-point ids and labels
            "point_idx": batch.point_idx,
            "labels": batch.y,
        }

    return eval_step
