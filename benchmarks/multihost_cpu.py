"""Execute the multi-host input + training path for real (VERDICT r2 #6).

Spawns N local processes, each `jax.distributed.initialize`-d into one
coordinator with M virtual CPU devices per process, so the FULL
multi-host flow runs: per-process MultiscaleLoader shards feed
``make_global_batch`` (whose ``make_array_from_process_local_data``
branch only executes when process_count > 1), and the pjit train step
all-reduces gradients across the global mesh.

Run: python benchmarks/multihost_cpu.py [--procs 2] [--devs 2] [--steps 3]
Each worker asserts loss finiteness + global batch shapes and prints a
per-step loss; the parent asserts all workers exit 0 and that their
losses AGREE (same global batch + replicated step ⇒ identical loss).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(proc_id: int, nprocs: int, ndevs: int, steps: int, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # 1-core host: don't let XLA's 40 s CPU-collective rendezvous abort
    # fire when the scheduler starves a device thread.  Per-flag presence
    # guards (as in conftest.py) so caller-supplied values win.
    flags = os.environ.get("XLA_FLAGS", "")
    for flag in (
        f"--xla_force_host_platform_device_count={ndevs}",
        "--xla_cpu_collective_call_terminate_timeout_seconds=3600",
        "--xla_cpu_collective_timeout_seconds=3600",
    ):
        if flag.split("=")[0] not in flags:
            flags = (flags + " " + flag).strip()
    os.environ["XLA_FLAGS"] = flags
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs
    import numpy as np
    import jax.numpy as jnp

    from crfconv_tpu.data.loader import MultiscaleLoader
    from crfconv_tpu.models import get_model
    from crfconv_tpu.parallel import make_global_batch, make_mesh, replicate
    from crfconv_tpu.train.train_state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    # tiny synthetic dataset; every process draws ITS OWN shard stream
    class SynthSet:
        def __len__(self):
            return 64

        def get_sample(self, rng, idx=None):
            n = 256
            return {
                "pos": rng.random((n, 3)).astype(np.float32),
                "x": rng.standard_normal((n, 6)).astype(np.float32),
                "y": rng.integers(0, 5, n).astype(np.int64),
            }

    per_proc_batch = 2
    loader = MultiscaleLoader(
        SynthSet(), per_proc_batch, seed=7, prefetch=0, device_put=False,
        num_shards=nprocs, shard_index=proc_id,
    )
    mesh = make_mesh()  # all global devices (nprocs * ndevs)
    model = get_model("PointConvBig", n_classes=5, use_crf=True, steps=1)
    tx = make_optimizer(
        lr=0.01, momentum=0.95, weight_decay=1e-4, gamma=0.95,
        steps_per_epoch=10,
    )
    local = next(iter(loader))
    state = create_train_state(model, local, tx, 0)
    state = replicate(state, mesh)
    step = jax.jit(make_train_step(model, None, -1, 0), donate_argnums=(0,))

    it = iter(loader)
    losses = []
    for i in range(steps):
        local = next(it)
        gb = make_global_batch(local, mesh)
        # the global leading axis spans all processes
        assert gb.x.shape[0] == per_proc_batch * nprocs, gb.x.shape
        assert not gb.x.is_fully_addressable or nprocs == 1
        state, m = step(state, gb, jax.random.PRNGKey(i))
        loss = float(m["loss"])  # replicated scalar: same on every host
        assert np.isfinite(loss)
        losses.append(loss)

    # eval/vote fetch path (ADVICE r2 low #4): a batch-sharded eval
    # output is NOT fully addressable under process_count > 1, so
    # Trainer._fetch must process_allgather it before numpy conversion —
    # execute that exact branch and checksum the gathered result so the
    # parent can assert every process reconstructed the same global array
    from crfconv_tpu.train.trainer import Trainer

    logits = jax.jit(
        lambda s, b: model.apply(
            {"params": s.params, "batch_stats": s.batch_stats},
            b, train=False,
        )
    )(state, gb)
    assert not logits.is_fully_addressable or nprocs == 1
    gathered = Trainer._fetch(logits)
    assert gathered.shape[0] == per_proc_batch * nprocs, gathered.shape
    fetch_sum = float(np.abs(gathered).sum())
    print(
        json.dumps(
            {"proc": proc_id, "losses": losses, "fetch_sum": fetch_sum}
        ),
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--port", type=int, default=12356)
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.procs, args.devs, args.steps, args.port)
        return

    procs = []
    for i in range(args.procs):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(i), "--procs", str(args.procs),
                 "--devs", str(args.devs), "--steps", str(args.steps),
                 "--port", str(args.port)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=1200) for p in procs]
    results = []
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            sys.stderr.write(f"worker {i} FAILED:\n{err[-3000:]}\n")
            sys.exit(1)
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    # replicated loss: every process must report the identical sequence
    base = results[0]["losses"]
    for r in results[1:]:
        assert all(
            abs(a - b) < 1e-6 for a, b in zip(base, r["losses"])
        ), (base, r)
    # _fetch/process_allgather: every process reconstructed the same
    # global eval array
    fs = results[0]["fetch_sum"]
    for r in results[1:]:
        assert abs(r["fetch_sum"] - fs) < 1e-4 * max(1.0, abs(fs)), results
    print(json.dumps({
        "multihost": "OK",
        "processes": args.procs,
        "devices_per_process": args.devs,
        "global_devices": args.procs * args.devs,
        "losses": base,
        "fetch_sum": fs,
    }))


if __name__ == "__main__":
    main()
