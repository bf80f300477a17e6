"""Windowed-vs-exact accuracy study (VERDICT r1 weak #2).

The windowed regime's neighbor graph is an approximation (83-96% edge
recall vs exact kNN).  This study measures what that costs on a LEARNED
metric: train the flagship model to convergence on a learnable synthetic
segmentation task under both regimes with identical seeds and compare
val mIoU.

Task: a fixed "world" labeling — 13-class Voronoi partition of the unit
cube from fixed anchors — sampled into random clouds.  Features are a
noisy linear embedding of the point's true class (40% label-flip noise
before embedding) plus xyz, so pointwise features alone are weak and the
model must aggregate spatial neighborhoods to denoise: exactly the
mechanism the approximate neighbor graph could hurt.

Shapes mirror bench.py (B=8, N=8192, C=6, 13 classes) so compiled
programs come from the persistent cache.

Run: JAX_PLATFORMS=axon python benchmarks/windowed_accuracy.py
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
TRAIN_BATCHES = 16
EPOCHS = 4
VAL_BATCHES = 4
SEEDS = (0, 1, 2)
FLIP = 0.4


def make_world(rng):
    anchors = rng.random((N_CLASSES, 3)).astype("float32")
    emb = rng.standard_normal((N_CLASSES, 3)).astype("float32")
    return anchors, emb


def sample_cloud(rng, anchors, emb, batch):
    import numpy as np

    pos = rng.random((batch, N, 3), dtype=np.float32)
    d = ((pos[:, :, None, :] - anchors[None, None]) ** 2).sum(-1)
    y = np.argmin(d, axis=-1)
    noisy = np.where(
        rng.random((batch, N)) < FLIP,
        rng.integers(0, N_CLASSES, (batch, N)),
        y,
    )
    hint = emb[noisy] + 0.3 * rng.standard_normal(
        (batch, N, 3)
    ).astype("float32")
    x = np.concatenate([hint.astype(np.float32), pos], axis=-1)
    return pos, x, y.astype(np.int32)


def run(mode: str, seed: int, tile: int = 128, pad: int = 192):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfconv_tpu.data.batch import PointBatch, RawBatch
    from crfconv_tpu.data.pipeline import build_pyramid
    from crfconv_tpu.models import PointConvResNet
    from crfconv_tpu.ops.neighbors import neighbor_mode
    from crfconv_tpu.train.metrics import scores_from_confusion
    from crfconv_tpu.train.train_state import (
        build_windowed_batch,
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    rng = np.random.default_rng(1000 + seed)
    anchors, emb = make_world(rng)
    windowed = mode == "windowed"

    def to_batch(pos, x, y):
        if windowed:
            return RawBatch(
                pos=jnp.asarray(pos), x=jnp.asarray(x), y=jnp.asarray(y)
            )
        scales = build_pyramid(pos, rng=rng)
        return PointBatch(
            x=jnp.asarray(x), y=jnp.asarray(y),
            scales=jax.tree_util.tree_map(jnp.asarray, tuple(scales)),
        )

    train_batches = [
        to_batch(*sample_cloud(rng, anchors, emb, B))
        for _ in range(TRAIN_BATCHES)
    ]
    val_batches = [
        to_batch(*sample_cloud(rng, anchors, emb, B))
        for _ in range(VAL_BATCHES)
    ]

    with neighbor_mode(mode, tile=tile, pad=pad):
        model = PointConvResNet(n_classes=N_CLASSES, use_crf=True, steps=1)
        tx = make_optimizer(lr=0.01)
        example = train_batches[0]
        if windowed:
            example = build_windowed_batch(example, jax.random.PRNGKey(0))
        state = create_train_state(model, example, tx, seed=seed)
        tstep = jax.jit(
            make_train_step(model, windowed=windowed), donate_argnums=(0,)
        )
        estep = jax.jit(make_eval_step(model, windowed=windowed))

        key = jax.random.PRNGKey(seed)
        for epoch in range(EPOCHS):
            for batch in train_batches:
                key, sub = jax.random.split(key)
                state, m = tstep(state, batch, sub)
        confusion = None
        for batch in val_batches:
            out = estep(state, batch)
            confusion = (
                out["confusion"] if confusion is None
                else confusion + out["confusion"]
            )
        scores, _ = scores_from_confusion(np.asarray(confusion))
    return scores["Mean IoU"], scores["Overall Acc"]


CONFIGS = [
    ("exact", 128, 192),
    ("windowed", 128, 192),     # current default geometry
    ("windowed", 64, 128),      # 1.8-2.4x faster geometry (tune_windowed)
]


def main():
    results = {}
    for seed in SEEDS:
        for mode, tile, pad in CONFIGS:
            key = mode if mode == "exact" else f"{mode}-t{tile}-p{pad}"
            miou, oa = run(mode, seed, tile, pad)
            results.setdefault(key, []).append(round(float(miou), 4))
            print(f"# seed {seed} {key}: mIoU {miou:.4f} OA {oa:.4f}",
                  file=sys.stderr, flush=True)
    import numpy as np

    out = {
        "metric": "windowed vs exact val mIoU "
        "(synthetic Voronoi denoising task, 3 seeds)",
        **results,
    }
    for key in results:
        if key != "exact":
            out[f"delta_{key}"] = round(
                float(np.mean(results[key]) - np.mean(results["exact"])), 4
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
