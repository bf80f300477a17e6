"""Baseline credibility bridge (VERDICT r3 #9).

No GPU exists in this environment, so the reference cannot be
re-measured on its own hardware class (configure.py:51-52 pins CUDA).
This script builds the best available evidence-based bridge from our
measured numbers to a GPU-class estimate of the reference:

  1. XLA cost analysis of the EXACT-regime flagship forward (the same
     math the torch reference executes) → FLOPs/point and bytes/point.
  2. A roofline band for a research-GPU of the reference's era
     (RTX 2080 Ti / V100 class, ~13-16 TF/s f32 peak, ~600-900 GB/s
     HBM): gather-heavy point-conv nets publish single-digit to ~30%
     compute efficiency, so the estimate is a BAND, not a number.
  3. The measured torch-CPU baselines (benchmarks/torch_baseline*.json)
     as hard lower anchors.

Output: benchmarks/baseline_bridge.json consumed by docs/BASELINE.md
prose.  Run on CPU: JAX_PLATFORMS=cpu python benchmarks/baseline_bridge.py
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

B, N, C_IN, N_CLASSES = 1, 8192, 6, 13

# Era-appropriate research GPU band (the reference pins a generic CUDA
# device; 2080 Ti ≈ 13.4 TF/s f32 / 616 GB/s, V100 ≈ 15.7 TF/s /
# 900 GB/s).  Efficiency band for gather-heavy point-conv stacks on
# GPUs: such nets are scatter/gather-bound; published end-to-end GPU
# utilization sits well under dense-conv levels.
GPU_PEAK_FLOPS = (13.4e12, 15.7e12)
GPU_PEAK_BW = (616e9, 900e9)
EFFICIENCY_BAND = (0.05, 0.30)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from crfconv_tpu.data.batch import PointBatch
    from crfconv_tpu.data.pipeline import build_pyramid
    from crfconv_tpu.models import PointConvResNet
    from crfconv_tpu.ops.neighbors import neighbor_mode

    rng = np.random.default_rng(0)
    pos = rng.random((B, N, 3), dtype=np.float32)
    feats = jnp.asarray(rng.random((B, N, C_IN), dtype=np.float32))
    scales = jax.tree_util.tree_map(
        jnp.asarray, tuple(build_pyramid(pos, rng=rng))
    )
    batch = PointBatch(x=feats, y=None, scales=scales)
    model = PointConvResNet(n_classes=N_CLASSES, use_crf=True, steps=1)

    with neighbor_mode("exact"):
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, train=False,
        )
        fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
        compiled = fwd.lower(variables, batch).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    fpp = flops / (B * N)
    bpp = bytes_ / (B * N)

    # compute-bound and bandwidth-bound ceilings, scaled by efficiency
    est = {}
    for eff in EFFICIENCY_BAND:
        lo = min(GPU_PEAK_FLOPS) * eff / fpp
        hi = max(GPU_PEAK_FLOPS) * eff / fpp
        bw_lo = min(GPU_PEAK_BW) * eff / bpp
        bw_hi = max(GPU_PEAK_BW) * eff / bpp
        est[f"eff={eff}"] = {
            "compute_bound_pts_per_s": [round(lo), round(hi)],
            "bandwidth_bound_pts_per_s": [round(bw_lo), round(bw_hi)],
            "min_of_both": [round(min(lo, bw_lo)), round(min(hi, bw_hi))],
        }

    out = {
        "what": "XLA cost analysis of the exact-regime flagship forward "
        f"(B={B}, N={N}, K=16, steps=1 — the reference math) + "
        "era-GPU roofline band",
        "flops_per_point": round(fpp, 1),
        "bytes_per_point": round(bpp, 1),
        "gpu_peak_flops_band": GPU_PEAK_FLOPS,
        "gpu_peak_bw_band": GPU_PEAK_BW,
        "efficiency_band": EFFICIENCY_BAND,
        "reference_gpu_estimate_pts_per_s": est,
        "anchors": {
            "torch_cpu_fwd_measured": "benchmarks/torch_baseline.json",
            "published_note": (
                "RandLA-Net (CVPR'20) reports ~10^5-pt SemanticKITTI "
                "scans at ~22 FPS on an RTX 2080 Ti (~2M pts/s for a "
                "much LIGHTER net: random sampling, no CRF decoder, "
                "K-nearest attention-free aggregation); KPConv-class "
                "dense point convs land well below that.  The reference "
                "adds a CRF decoder and dense K=16 MLP-weighted convs "
                "at full resolution on torch_geometric scatter ops."
            ),
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "baseline_bridge.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
