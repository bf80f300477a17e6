"""Steady-state training throughput with the REAL input pipeline
(VERDICT r2 #5): MultiscaleLoader (background host pyramid build +
prefetch) feeding the jitted device step, vs the device-bound rate with
a resident batch.  This measures the fix for the reference's #1
bottleneck — its collate ran inline with num_workers=0
(trainval.py:54, SURVEY.md §7 hard part #5).

Two regimes:
  * exact   — loader emits full host-built pyramids (C++ kNN);
  * windowed — loader emits raw batches; the device builds the pyramid
    inside the step (host work is just sampling + transfer).

Run: python benchmarks/loader_throughput.py [--batch 8] [--points 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crfconv_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


class SynthSet:
    """In-memory random clouds, S3DIS crop statistics."""

    def __init__(self, n_pts, n_classes=13, size=4096):
        self.n = n_pts
        self.c = n_classes
        self.size = size

    def __len__(self):
        return self.size

    def get_sample(self, rng, idx=None):
        import numpy as np

        return {
            "pos": rng.random((self.n, 3)).astype("float32") * 3,
            "x": rng.standard_normal((self.n, 6)).astype("float32"),
            "y": rng.integers(0, self.c, self.n).astype("int64"),
        }


def measure(batch_size: int, n_pts: int, steps: int = 30):
    import jax
    import numpy as np

    from crfconv_tpu.data.loader import MultiscaleLoader
    from crfconv_tpu.models import get_model
    from crfconv_tpu.ops.neighbors import set_neighbor_mode
    from crfconv_tpu.train.train_state import (
        build_windowed_batch,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    results = {}
    for regime in ("windowed", "exact"):
        set_neighbor_mode(regime if regime == "windowed" else "exact")
        emit = "raw" if regime == "windowed" else "pyramid"
        ds = SynthSet(n_pts)
        loader = MultiscaleLoader(
            ds, batch_size, seed=0, prefetch=2, emit=emit
        )
        model = get_model("PointConvBig", n_classes=13, use_crf=True, steps=1)
        tx = make_optimizer(
            lr=0.01, momentum=0.95, weight_decay=1e-4, gamma=0.95,
            steps_per_epoch=100,
        )
        example = next(iter(
            MultiscaleLoader(ds, batch_size, seed=0, prefetch=0, emit=emit)
        ))
        ex = (
            build_windowed_batch(example, jax.random.PRNGKey(0))
            if regime == "windowed"
            else example
        )
        state = create_train_state(model, ex, tx, 0)
        step = jax.jit(
            make_train_step(
                model, None, -1, 0, windowed=regime == "windowed"
            ),
            donate_argnums=(0,),
        )

        # NOTE: block_until_ready is unreliable on tunneled runtimes
        # (docs/STATUS.md r2: async-dispatch fiction); a float() value
        # readback of the chain's final loss cannot lie — the 30-step
        # makespan is bounded below by real sequential execution because
        # each step consumes the donated previous state.

        # device-bound rate: one resident batch, chained steps
        resident = example
        for i in range(3):   # warmup / compile
            state, m = step(state, resident, jax.random.PRNGKey(i))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, resident, jax.random.PRNGKey(i))
        float(m["loss"])
        dev_dt = (time.perf_counter() - t0) / steps

        # loader-fed rate: fresh batch per step through prefetch
        it = iter(loader)
        for i in range(3):
            state, m = step(state, next(it), jax.random.PRNGKey(i))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, next(it), jax.random.PRNGKey(i))
        float(m["loss"])
        load_dt = (time.perf_counter() - t0) / steps

        pts = batch_size * n_pts
        results[regime] = {
            "device_bound_ms": round(dev_dt * 1e3, 2),
            "loader_fed_ms": round(load_dt * 1e3, 2),
            "device_bound_pts_per_s": round(pts / dev_dt),
            "loader_fed_pts_per_s": round(pts / load_dt),
            "overhead_pct": round((load_dt / dev_dt - 1) * 100, 1),
        }
        print(json.dumps({"regime": regime, **results[regime]}), flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    measure(args.batch, args.points, args.steps)
