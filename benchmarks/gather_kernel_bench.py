"""Kernel-level benchmark of the windowed Pallas gather.

Times windowed_gather_pallas at the S3DIS and Semantic3D working shapes
(device_time protocol) so kernel revisions carry measured evidence.

Run: JAX_PLATFORMS=axon python benchmarks/gather_kernel_bench.py
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

# (label, B, N, K, F) — model gather shapes on the hot path
SHAPES = [
    ("s3dis-scale0-conv", 8, 8192, 16, 11),    # pos+h+x rider gather
    ("s3dis-scale0-crf", 8, 8192, 15, 16),     # CRF fused [y,z] gather
    ("s3dis-scale1", 8, 2048, 16, 19),
    ("sem3d-scale0-conv", 8, 65536, 16, 11),
    ("sem3d-scale0-f32wide", 8, 65536, 16, 32),
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfconv_tpu.ops.windowed_pallas import windowed_gather_pallas
    from crfconv_tpu.utils import device_time

    rng = np.random.default_rng(0)
    results = {}
    for label, B, N, K, F in SHAPES:
        x = jnp.asarray(rng.random((B, N, F), dtype=np.float32))
        idx = jnp.asarray(
            np.clip(
                np.arange(N)[None, :, None]
                + rng.integers(-96, 96, (B, N, K)),
                0, N - 1,
            ).astype(np.int32)
        )

        results[label] = {}
        for body in ("v1", "v2", "v3"):

            def step(carry, x=x, idx=idx, body=body):
                out = windowed_gather_pallas(carry, idx, large_body=body)
                # fold the gather back so iterations depend on each other
                return carry + 1e-9 * out[:, :, 0, :]

            t = device_time(step, x, iters=10)
            gbps = B * N * K * F * 4 / t / 1e9
            results[label][body] = {
                "ms": round(t * 1e3, 3),
                "gathered_GBps": round(gbps, 1),
            }
            print(
                f"# {label} [{body}]: {t * 1e3:.3f} ms "
                f"({gbps:.0f} GB/s gathered)",
                file=sys.stderr, flush=True,
            )
    print(json.dumps({"metric": "windowed_gather_pallas kernel", **results}))


if __name__ == "__main__":
    main()
