"""Headline benchmark: S3DIS-config inference points/sec/chip.

Measures steady-state forward throughput of the flagship
PointConvResNet (use_crf=True, steps=1) on the S3DIS workload shape
(batch 8 x 8192 points, K=16, 5-scale ¼-rate pyramid — reference
configure.py:94-98, datasets/s3dis_dataset.py:392-393) on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "points/sec/chip", "vs_baseline": N}

vs_baseline compares against the plain-torch re-execution of the
reference model (tests/torch_ref.py) measured on this host's CPU — the
only reference implementation measurable in this environment (the
upstream torch_geometric CUDA stack is not installed and no numbers are
published; see BASELINE.md).  The torch number is cached in
benchmarks/torch_baseline.json after first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "benchmarks",
    "torch_baseline.json",
)

BATCH = 8
POINTS = 8192
IN_CHANNELS = 6
N_CLASSES = 13
WARMUP = 3
ITERS = 10


def measure_jax() -> float:
    import jax

    from crfconv_tpu.data.pipeline import synthetic_batch
    from crfconv_tpu.models import PointConvResNet

    batch = synthetic_batch(
        BATCH, POINTS, IN_CHANNELS, N_CLASSES, seed=0
    )
    model = PointConvResNet(n_classes=N_CLASSES, use_crf=True, steps=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )

    @jax.jit
    def forward(variables, batch):
        return model.apply(variables, batch, train=False)

    out = forward(variables, batch)
    out.block_until_ready()
    for _ in range(WARMUP - 1):
        forward(variables, batch).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        forward(variables, batch).block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH * POINTS / dt


def measure_torch_baseline(max_iters: int = 3) -> float:
    """Reference model re-execution on host CPU (cached)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["points_per_sec"]

    import numpy as np
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.torch_ref import TorchPointConvResNet
    from crfconv_tpu.data.pipeline import build_pyramid

    torch.set_num_threads(os.cpu_count() or 1)
    rng = np.random.default_rng(0)
    pos = rng.random((BATCH, POINTS, 3), dtype=np.float32)
    x = torch.from_numpy(
        rng.random((BATCH, POINTS, IN_CHANNELS), dtype=np.float32)
    )
    scales = [
        {
            "pos": torch.from_numpy(s.pos),
            "neighbor_idx": torch.from_numpy(s.neighbor_idx).long(),
            "sub_idx": torch.from_numpy(s.sub_idx).long(),
            "up_idx": torch.from_numpy(s.up_idx).long(),
        }
        for s in build_pyramid(pos, rng=rng)
    ]
    model = TorchPointConvResNet(IN_CHANNELS, N_CLASSES, use_crf=True, steps=1)
    model.eval()
    with torch.no_grad():
        model(x, scales)  # warmup
        t0 = time.perf_counter()
        for _ in range(max_iters):
            model(x, scales)
        dt = (time.perf_counter() - t0) / max_iters
    pps = BATCH * POINTS / dt
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            {
                "points_per_sec": pps,
                "what": "TorchPointConvResNet fwd, CPU, "
                f"B={BATCH} N={POINTS} K=16 steps=1",
            },
            f,
        )
    return pps


def main():
    value = measure_jax()
    try:
        baseline = measure_torch_baseline()
        vs = value / baseline
    except Exception:
        vs = None
    print(
        json.dumps(
            {
                "metric": "S3DIS-config inference throughput (PointConvBig, CRF steps=1)",
                "value": round(value, 1),
                "unit": "points/sec/chip",
                "vs_baseline": None if vs is None else round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
