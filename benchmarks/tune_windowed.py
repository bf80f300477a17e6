"""TILE/PAD sweep for the windowed regime (VERDICT r1 weak #7).

Sweeps the window geometry over {64,128,256}×{128,192,256} at the two
hot gather shapes plus the in-window kNN search that shares the same
geometry.  Kernel-level only (fast compiles); e2e defaults change only
if a combo wins clearly beyond the measured run-to-run noise (~±10%).

Run: JAX_PLATFORMS=axon python benchmarks/tune_windowed.py
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

TILES = (64, 128, 256)
PADS = (128, 192, 256)
SHAPES = [
    ("s3dis", 8, 8192, 16, 11),
    ("sem3d", 8, 65536, 16, 11),
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfconv_tpu.ops.windowed import window_knn
    from crfconv_tpu.ops.windowed_pallas import windowed_gather_pallas
    from crfconv_tpu.utils import device_time

    rng = np.random.default_rng(0)
    results = {}
    for label, B, N, K, F in SHAPES:
        x = jnp.asarray(rng.random((B, N, F), dtype=np.float32))
        pos = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
        for tile in TILES:
            for pad in PADS:
                idx = np.clip(
                    np.arange(N)[None, :, None]
                    + rng.integers(-pad // 2, pad // 2, (B, N, K)),
                    0, N - 1,
                ).astype(np.int32)
                idxj = jnp.asarray(idx)

                def gstep(carry, idxj=idxj, tile=tile, pad=pad):
                    out = windowed_gather_pallas(carry, idxj, tile, pad)
                    return carry + 1e-9 * out[:, :, 0, :]

                tg = device_time(gstep, x, iters=10)

                def kstep(carry, tile=tile, pad=pad):
                    i = window_knn(carry, K, tile=tile, pad=pad)
                    return carry + 1e-9 * i[..., :3].astype(carry.dtype)

                tk = device_time(kstep, pos, iters=4)
                key = f"{label}-t{tile}-p{pad}"
                results[key] = {
                    "gather_ms": round(tg * 1e3, 3),
                    "knn_ms": round(tk * 1e3, 3),
                }
                print(
                    f"# {key}: gather {tg * 1e3:.3f} ms, "
                    f"knn {tk * 1e3:.3f} ms",
                    file=sys.stderr, flush=True,
                )
    print(json.dumps({"metric": "windowed tile/pad sweep", **results}))


if __name__ == "__main__":
    main()
