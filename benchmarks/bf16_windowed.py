"""bf16 A/B on the windowed regime (auxiliary datapoint).

The windowed regime is matmul-shaped, so bf16 model matmuls
(compute_dtype knob) may pay off where the exact regime (gather-bound)
would not.  Prints one JSON line with both numbers.

Run: python benchmarks/bf16_windowed.py
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


def main():
    import jax.numpy as jnp

    from bench import measure_jax
    from crfconv_tpu.models.common import set_compute_dtype

    f32 = measure_jax("windowed")
    print(f"# f32 windowed: {f32:,.0f} pts/s", file=sys.stderr, flush=True)
    set_compute_dtype(jnp.bfloat16)
    try:
        bf16 = measure_jax("windowed")
    finally:
        set_compute_dtype(None)
    print(
        json.dumps(
            {
                "metric": "windowed e2e inference f32 vs bf16 matmuls",
                "f32_pts_per_sec": round(f32, 1),
                "bf16_pts_per_sec": round(bf16, 1),
                "speedup": round(bf16 / f32, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
