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

Two modes: 'loop' (default — one fori_loop dispatch per timed call,
dynamic trip count, single compile) and 'chain' (jit the bare step and
dispatch it n times).  Loop is the default because the tunneled runtime
shows SECONDS of per-dispatch latency (measured 3-15 s, varying with
tunnel load): chain mode's ~70 dispatches turned a 90 s measurement
into 18 minutes, while loop mode needs 7 dispatches total.  The r4
lesson lives in ``env``: loop-invariant device arrays must be passed as
jit arguments, never closed over (see below) — with closures the loop
program's jaxpr→MLIR lowering embedded every model parameter as a
constant at ~3.7 s per device fetch (cProfile r5: 99.6% of a 1340 s
lowering), which was the real cause of round 4's rc=124 driver bench.

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
    step: Callable[..., Any],
    init: Any,
    iters: int = 10,
    warmup: bool = True,
    mode: str = "loop",
    env: Any = None,
) -> float:
    """Seconds per call of ``step`` (a carry -> carry function).

    ``env`` (optional) is a pytree of loop-invariant operands (model
    variables, input features, ...) passed to ``step(carry, env)`` as a
    jit ARGUMENT.  Pass every device array the step needs through here
    rather than closing over it: a closed-over jax.Array is embedded as
    an MLIR constant at lowering time, and each embedding fetches the
    array's value from the device — measured ~3.7 s PER ARRAY through
    the tunneled runtime, ×~300 model parameter leaves ≈ 22 minutes of
    "compile" for one benchmark program (r5 cProfile:
    _array_mlir_constant_handler was 99.6% of a 1340 s lowering).

    mode='loop' (default): one fori_loop dispatch per timed call with a
    dynamic trip count (single compile) — 7 dispatches total, which
    matters because the tunneled runtime's per-dispatch latency is
    seconds.  mode='chain': jit the bare step and dispatch it n times as
    a data-dependent chain — kept for cross-checking (the two protocols
    agree on the headline shape: 5.38M vs 5.27M pts/s, r5) and for
    environments with normal dispatch latency.
    """
    has_env = env is not None
    call = (lambda c, e: step(c, e)) if has_env else (lambda c, e: step(c))

    import os
    import sys

    debug = bool(os.environ.get("CRFCONV_TIME_DEBUG"))

    def _dbg(msg, t0):
        if debug:
            print(
                f"# device_time: {msg} {time.perf_counter() - t0:.1f}s",
                file=sys.stderr, flush=True,
            )

    if mode == "loop":
        @jax.jit
        def run_loop(carry, n, e):
            out = jax.lax.fori_loop(
                0, n, lambda i, c: call(c, e), carry,
            )
            return _scalarize(out)

        if warmup:
            t0 = time.perf_counter()
            float(run_loop(init, 1, env))
            _dbg("warmup (compile + 1 iter)", t0)

        def timed(n):
            # min-of-3: host-side dispatch jitter on a 1-core machine
            # can exceed a fast kernel's whole runtime in one sample
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run_loop(init, n, env))
                best = min(best, time.perf_counter() - t0)
                _dbg(f"dispatch n={n}", t0)
            return best

        t1 = timed(iters)
        t2 = timed(2 * iters)
        if t2 > t1:
            return (t2 - t1) / iters
        # noise swamped the diff (seen as "0.000 ms" readings): report
        # the dispatch-inclusive upper bound, not a fictitious zero
        return t2 / (2 * iters)

    fn = jax.jit(call)
    readout = jax.jit(_scalarize)
    if warmup:
        float(readout(fn(init, env)))

    def timed(n):
        best = float("inf")
        for _ in range(3):
            c = init
            t0 = time.perf_counter()
            for _ in range(n):
                c = fn(c, env)
            float(readout(c))   # forces the whole chain to completion
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(iters)
    t2 = timed(2 * iters)
    if t2 > t1:
        return (t2 - t1) / iters
    return t2 / (2 * iters)
