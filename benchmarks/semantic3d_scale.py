"""Semantic3D-scale measurement: windowed e2e inference at 16×65536.

The exact regime cannot build this pyramid on device in reasonable time
(top_k over 65536-wide rows costs ~5 s/scale); the windowed regime's
O(N·W) search makes the full config tractable.  Prints a JSON line like
bench.py (not the headline metric — an auxiliary scale datapoint).

Run: python benchmarks/semantic3d_scale.py
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

# batch 8 (not the reference's 16): inference intermediates at 16x65536
# exceed one v5e's 16 GB HBM without rematerialization; 8 fits.
BATCH = 8
POINTS = 65536
IN_CHANNELS = 6
N_CLASSES = 8


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
    pos = jnp.asarray(rng.random((BATCH, POINTS, 3), dtype=np.float32))
    feats = jnp.asarray(
        rng.random((BATCH, POINTS, IN_CHANNELS), dtype=np.float32)
    )
    model = PointConvResNet(n_classes=N_CLASSES, use_crf=True, steps=1)

    with neighbor_mode("windowed"):
        order, scales = build_pyramid_windowed(pos, key=jax.random.PRNGKey(0))
        x0 = jnp.take_along_axis(feats, order[..., None], axis=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            PointBatch(x=x0, y=None, scales=scales),
            train=False,
        )

        def step(carry):
            p, key = carry
            key, sub = jax.random.split(key)
            order, scales = build_pyramid_windowed(p, key=sub)
            x = jnp.take_along_axis(feats, order[..., None], axis=1)
            out = model.apply(
                variables, PointBatch(x=x, y=None, scales=scales),
                train=False,
            )
            return (p + 1e-9 * out[..., :3], key)

        t = device_time(step, (pos, jax.random.PRNGKey(2)), iters=4)

    print(
        json.dumps(
            {
                "metric": "Semantic3D-config e2e inference "
                f"({BATCH}x{POINTS}, windowed regime)",
                "value": round(BATCH * POINTS / t, 1),
                "unit": "points/sec/chip",
                "ms_per_batch": round(t * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
