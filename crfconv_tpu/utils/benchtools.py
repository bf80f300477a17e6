"""Trustworthy device timing.

Per-call wall-clock timing is unreliable on remote/tunneled TPU runtimes:
dispatch is async-pipelined and ``block_until_ready`` can return before
execution completes, so sub-dispatch-latency measurements are fiction
(observed: "0.3 ms" for a 1.1-TFLOP matmul).  The robust protocol:

  1. wrap the step in a ``lax.fori_loop`` carrying a data dependency so
     XLA cannot elide or overlap iterations arbitrarily;
  2. run the whole loop as ONE dispatch;
  3. force completion by reading back a scalar that depends on the
     final carry;
  4. difference two trip counts of the SAME compiled program
     (t(2n) − t(n)) / n, which cancels both the dispatch-latency floor
     and any loop-entry overhead.

The trip count is a *traced* scalar, so the whole protocol compiles ONE
program — the previous run_once/run_loop pair compiled the full step
twice, doubling every benchmark's cold-compile cost for no metrological
gain (VERDICT r4 weak #1/#5).

``device_time(step, init, iters)`` returns seconds per call.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp


def _scalarize(tree: Any) -> jnp.ndarray:
    leaves = [
        jnp.sum(l).astype(jnp.float32)
        for l in jax.tree_util.tree_leaves(tree)
        if hasattr(l, "dtype")
    ]
    return sum(leaves[:4]) if leaves else jnp.float32(0)


def device_time(
    step: Callable[[Any], Any],
    init: Any,
    iters: int = 10,
    warmup: bool = True,
) -> float:
    """Seconds per call of ``step`` (a carry -> carry function), measured
    as fused fori_loop dispatches forced by a scalar readback."""

    @jax.jit
    def run_loop(carry, n):
        out = jax.lax.fori_loop(
            0, n, lambda i, c: step(c), carry,
        )
        return _scalarize(out)

    if warmup:
        float(run_loop(init, 1))

    def timed(n):
        # min-of-3: host-side dispatch jitter on a 1-core machine can
        # exceed a fast kernel's whole runtime in a single sample
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_loop(init, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(iters)
    t2 = timed(2 * iters)
    if t2 > t1:
        return (t2 - t1) / iters
    # noise swamped the diff (seen as "0.000 ms" readings): report the
    # dispatch-inclusive upper bound rather than a fictitious zero
    return t2 / (2 * iters)
