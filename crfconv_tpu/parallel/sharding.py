"""Device-mesh parallelism.

The reference is single-GPU (SURVEY.md §2.7: no DP/TP/PP/SP, no comm
backend), so parallelism here is greenfield and idiomatic JAX: a 1-D
``data`` mesh, batches sharded on the leading axis with NamedSharding,
parameters/optimizer state replicated, and XLA inserting the gradient
all-reduce over ICI.  The same jitted train step runs single-chip (mesh
of 1) or across a pod slice; host-side input pipelines shard per process.

Spatial (point-axis) sharding — the TPU analog of the reference's
block/crop decomposition for very large clouds — composes on top by
sharding N instead of B; the gather-based ops stay correct because each
crop's index pyramid is local to its own batch row.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis: str = "data"
) -> Mesh:
    """A 1-D mesh over the first n devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _batch_spec(leaf, axis: str) -> P:
    # shard the leading (batch) axis; replicate scalars/1-D aux arrays
    if hasattr(leaf, "ndim") and leaf.ndim >= 1:
        return P(axis)
    return P()


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a PointBatch with its leading axis sharded over the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, _batch_spec(x, axis))
        ),
        batch,
    )


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def shard_points(batch, mesh: Mesh, axis: str = "data"):
    """Spatial parallelism: shard the POINT axis (dim 1) over the mesh.

    The TPU analog of the reference's spatial block/crop decomposition
    (SURVEY.md §5 "long-context"): with the windowed regime, each device
    holds a contiguous span of Morton-sorted points and XLA materializes
    the halo exchanges implied by the window slices as ICI collectives.
    Use for clouds too large for one chip's HBM; batch DP remains the
    default strategy.
    """

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            return P(None, axis)  # [B, N, ...] -> shard N
        return P()

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec(x))), batch
    )


def make_global_batch(local_batch, mesh: Mesh, axis: str = "data"):
    """Assemble a globally-sharded batch from per-process local shards.

    Multi-host flow (SURVEY.md §7): every process runs its own
    MultiscaleLoader shard (num_shards=jax.process_count()) producing a
    LOCAL batch of per-process size; this helper forms the global jax
    Arrays whose leading axis is sharded over the whole mesh, with each
    process contributing its addressable slice.  On a single process it
    degenerates to shard_batch.
    """
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh, axis)

    def to_global(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        sharding = NamedSharding(mesh, _batch_spec(x, axis))
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )

    return jax.tree_util.tree_map(to_global, local_batch)


def make_parallel_train_step(
    train_step: Callable, mesh: Mesh, axis: str = "data"
) -> Callable:
    """jit the train step with explicit output shardings.

    State is replicated, the batch sharded on its leading axis (via
    shard_batch/replicate at placement time); pinning the OUTPUT state to
    the replicated sharding makes XLA insert the gradient all-reduce over
    ICI rather than leaving results batch-sharded.
    """
    repl = NamedSharding(mesh, P())

    def wrapped(state, batch, rng):
        new_state, metrics = train_step(state, batch, rng)
        new_state = jax.lax.with_sharding_constraint(
            new_state, jax.tree_util.tree_map(lambda _: repl, new_state)
        )
        return new_state, metrics

    return jax.jit(wrapped, donate_argnums=(0,))
