"""Semantic3D-scale measurement: windowed e2e inference at the FULL
reference test config 16×65536 (configure.py:144,149) and at 8×65536.

The exact regime cannot build this pyramid on device in reasonable time
(top_k over 65536-wide rows costs ~5 s/scale); the windowed regime's
O(N·W) search makes the full config tractable.  16×65536 inference
intermediates exceed one v5e's 16 GB HBM in a flat program, so the batch
is microbatched on-device with ``lax.map`` over chunks of 8 — one
chunk's intermediates live at a time, single dispatch, same jitted
sub-program as the 8×65536 case.  Prints a JSON line per config (not the
headline metric — auxiliary scale datapoints).

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

POINTS = 65536
IN_CHANNELS = 6
N_CLASSES = 8
MICRO = 8          # chunk size that fits one chip's HBM


def measure(batch: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfconv_tpu.data.batch import PointBatch
    from crfconv_tpu.models import PointConvResNet
    from crfconv_tpu.ops.neighbors import neighbor_mode
    from crfconv_tpu.ops.windowed import build_pyramid_windowed
    from crfconv_tpu.utils import device_time

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((batch, POINTS, 3), dtype=np.float32))
    feats = jnp.asarray(
        rng.random((batch, POINTS, IN_CHANNELS), dtype=np.float32)
    )
    model = PointConvResNet(n_classes=N_CLASSES, use_crf=True, steps=1)
    nc = max(batch // MICRO, 1)
    micro = min(batch, MICRO)

    with neighbor_mode("windowed"):

        def forward(pos_c, x_c, key):
            order, scales = build_pyramid_windowed(pos_c, key=key)
            x = jnp.take_along_axis(x_c, order[..., None], axis=1)
            return PointBatch(x=x, y=None, scales=scales)

        b0 = forward(pos[:micro], feats[:micro], jax.random.PRNGKey(0))
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            b0, train=False,
        )

        def step(carry, env):
            vrs, fts = env
            p, key = carry
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, nc)
            out = jax.lax.map(
                lambda a: model.apply(
                    vrs, forward(a[0], a[1], a[2]), train=False
                ),
                (
                    p.reshape(nc, micro, POINTS, 3),
                    fts.reshape(nc, micro, POINTS, IN_CHANNELS),
                    keys,
                ),
            )
            out = out.reshape(batch, POINTS, N_CLASSES)
            return (p + 1e-9 * out[..., :3], key)

        t = device_time(
            step, (pos, jax.random.PRNGKey(2)), iters=4,
            env=(variables, feats),
        )
    return batch * POINTS / t, t


def main():
    for batch in (8, 16):
        pps, t = measure(batch)
        print(
            json.dumps(
                {
                    "metric": "Semantic3D-config e2e inference "
                    f"({batch}x{POINTS}, windowed regime"
                    + (f", lax.map microbatch {MICRO}" if batch > MICRO
                       else "")
                    + ")",
                    "value": round(pps, 1),
                    "unit": "points/sec/chip",
                    "ms_per_batch": round(t * 1e3, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
