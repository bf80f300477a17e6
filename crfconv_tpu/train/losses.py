"""Loss functions.

``weighted_cross_entropy`` reproduces torch F.cross_entropy semantics with
per-class weights and ignore_index (reference trainval.py:101-104): the
loss is the weight-of-target-normalized mean
    Σ_i w_{y_i} · nll_i / Σ_i w_{y_i}
over non-ignored points.  Applying log_softmax is idempotent, so the same
function accepts raw logits (big family) and log-probabilities (small
family / dual heads).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def weighted_cross_entropy(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """Torch-semantics weighted CE with ignore_index.

    Args:
      scores: [..., C] logits or log-probabilities.
      labels: [...] int labels; entries equal to ignore_index (or outside
              [0, C)) contribute nothing.
      class_weights: optional [C] per-class weights.
      ignore_index: label value to skip.

    Returns:
      scalar loss.
    """
    n_classes = scores.shape[-1]
    # loss math at ≥f32 (scores may arrive bf16 in mixed precision)
    logp = jax.nn.log_softmax(
        scores.astype(jnp.promote_types(scores.dtype, jnp.float32)), axis=-1
    )
    labels = labels.reshape(-1)
    logp = logp.reshape(-1, n_classes)

    valid = (labels != ignore_index) & (labels >= 0) & (labels < n_classes)
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]

    if class_weights is None:
        w = valid.astype(logp.dtype)
    else:
        w = jnp.where(valid, class_weights[safe], 0.0).astype(logp.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def weighted_cross_entropy_parts(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(numerator Σ w·nll, denominator Σ w) of the weighted CE — lets a
    point-sharded trainer psum both parts for the exact global loss
    (parallel/spatial_train.py)."""
    n_classes = scores.shape[-1]
    logp = jax.nn.log_softmax(
        scores.astype(jnp.promote_types(scores.dtype, jnp.float32)), axis=-1
    )
    labels = labels.reshape(-1)
    logp = logp.reshape(-1, n_classes)
    valid = (labels != ignore_index) & (labels >= 0) & (labels < n_classes)
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    if class_weights is None:
        w = valid.astype(logp.dtype)
    else:
        w = jnp.where(valid, class_weights[safe], 0.0).astype(logp.dtype)
    return jnp.sum(nll * w), jnp.sum(w)


def segmentation_loss_parts(
    outputs: Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]],
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Numerator/denominator form of :func:`segmentation_loss` (heads
    share the denominator, so dual-head loss = Σ num_h / den)."""
    heads = outputs if isinstance(outputs, (tuple, list)) else (outputs,)
    num = 0.0
    den = None
    for o in heads:
        n_h, d_h = weighted_cross_entropy_parts(
            o, labels, class_weights, ignore_index
        )
        num = num + n_h
        den = d_h if den is None else den
    return num, den


def segmentation_loss(
    outputs: Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]],
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """Dispatch: single-head CE, or summed dual-head CE for models that
    return (log p, log q) (reference models/point_conv.py:567, :618)."""
    if isinstance(outputs, (tuple, list)):
        return sum(
            weighted_cross_entropy(o, labels, class_weights, ignore_index)
            for o in outputs
        )
    return weighted_cross_entropy(outputs, labels, class_weights, ignore_index)
