"""Trustworthy device timing.

Per-call wall-clock timing is unreliable on remote/tunneled TPU runtimes:
dispatch is async-pipelined and ``block_until_ready`` can return before
execution completes, so sub-dispatch-latency measurements are fiction
(observed: "0.3 ms" for a 1.1-TFLOP matmul).  The robust protocol:

  1. chain iterations through a data dependency (each call consumes the
     previous carry) so the device must execute them serially;
  2. force completion by reading back a scalar computed from the final
     carry — block_until_ready alone has been observed returning early
     through the tunnel;
  3. difference two trip counts, (t(2n) − t(n)) / n, which cancels the
     pipeline-fill and readback constants.

Two modes: 'chain' (default — jit the bare step, dispatch it n times;
compiles in seconds) and 'loop' (the r2-r4 fori_loop single-dispatch
protocol; same numbers within noise, but XLA compile time of the big
windowed step inside a fori_loop measured ~400× the bare step's — the
root cause of round 4's rc=124 driver bench).

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
    mode: str = "chain",
) -> float:
    """Seconds per call of ``step`` (a carry -> carry function).

    mode='chain' (default): jit the bare step ONCE and dispatch it
    iters / 2·iters times as a data-dependent chain, forcing completion
    with a scalar readback of the final carry; the two trip counts are
    differenced.  Dispatch overhead pipelines against device execution
    exactly as in production serving, and the one-call constant
    (readback + pipeline fill) cancels in the difference.  Chosen
    because wrapping the full step in a fori_loop made XLA compile time
    explode ~400× on the big windowed programs (measured r5: the
    forward alone compiles in 6.5 s, the same forward inside a
    fori_loop in tens of minutes — the rc=124 driver bench of r4,
    VERDICT r4 weak #1/#5).

    mode='loop': the r2-r4 protocol — one fori_loop dispatch (dynamic
    trip count, single compile).  Kept for cross-checking: the two
    protocols agree within noise (validated on the headline shape, r5).
    """
    if mode == "loop":
        @jax.jit
        def run_loop(carry, n):
            out = jax.lax.fori_loop(
                0, n, lambda i, c: step(c), carry,
            )
            return _scalarize(out)

        if warmup:
            float(run_loop(init, 1))

        def timed(n):
            # min-of-3: host-side dispatch jitter on a 1-core machine
            # can exceed a fast kernel's whole runtime in one sample
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
        # noise swamped the diff (seen as "0.000 ms" readings): report
        # the dispatch-inclusive upper bound, not a fictitious zero
        return t2 / (2 * iters)

    fn = jax.jit(step)
    readout = jax.jit(_scalarize)
    if warmup:
        float(readout(fn(init)))

    def timed(n):
        best = float("inf")
        for _ in range(3):
            c = init
            t0 = time.perf_counter()
            for _ in range(n):
                c = fn(c)
            float(readout(c))   # forces the whole chain to completion
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(iters)
    t2 = timed(2 * iters)
    if t2 > t1:
        return (t2 - t1) / iters
    return t2 / (2 * iters)
