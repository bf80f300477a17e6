"""Windowed-vs-exact accuracy study, decision grade (VERDICT r2 #3).

The windowed regime's neighbor graph is an approximation (83-96% edge
recall vs exact kNN).  This study measures what that costs on a LEARNED
metric: train the flagship model to a convergence plateau (early stop on
val) under each regime/geometry with identical seeds and compare best
val mIoU, over 5 seeds, on TWO tasks:

  * voronoi — 13-class Voronoi partition of the unit cube (labels are
    blobby and mostly Morton-local);
  * slabs   — thin slanted slabs: class = quantized position along an
    oblique axis with a short period, so label structure cuts ACROSS
    Morton tiles (the adversarial case for a window that only sees a
    contiguous span of the sorted order).

Features are a noisy linear embedding of the true class (40% label-flip
noise before embedding) plus xyz, so pointwise features alone are weak
and the model must aggregate spatial neighborhoods to denoise — exactly
the mechanism an approximate neighbor graph could hurt.

Arms: exact; windowed PAD ∈ {64, 128, 192} at tile 64 (the edge-recall →
mIoU sensitivity curve); and the packed-key kNN selection
(knn_exact=False) at the default t64-p128 geometry (the candidate
production default).  Per-geometry edge recall vs exact kNN is also
reported.

Run: JAX_PLATFORMS=axon python benchmarks/windowed_accuracy.py
(background job; ~1-2 h with cold compiles, minutes cached)
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
MAX_EPOCHS = 24
PATIENCE = 4
VAL_BATCHES = 4
SEEDS = (0, 1, 2, 3, 4)
FLIP = 0.4


def make_world(rng, task):
    if task == "voronoi":
        anchors = rng.random((N_CLASSES, 3)).astype("float32")
    else:  # slabs: oblique axis + short period
        axis = rng.standard_normal(3).astype("float32")
        axis /= (axis**2).sum() ** 0.5
        anchors = axis  # reused slot
    emb = rng.standard_normal((N_CLASSES, 3)).astype("float32")
    return anchors, emb


def labels_for(pos, anchors, task):
    import numpy as np

    if task == "voronoi":
        d = ((pos[:, :, None, :] - anchors[None, None]) ** 2).sum(-1)
        return np.argmin(d, axis=-1)
    # slabs: class = floor(projection / thickness) mod C — thin slanted
    # structures of ~0.08 thickness spanning every Morton tile
    proj = pos @ anchors
    return (np.floor(proj / 0.08).astype(np.int64) % N_CLASSES).astype(
        np.int64
    )


def sample_cloud_rooms(rng, batch):
    """Structured-room task (VERDICT r4 #4: a non-synthetic-geometry
    arm): each cloud is one generated office room
    (crfconv_tpu.parity.synthetic) — floors/walls/furniture with the
    13-class S3DIS nomenclature and class-correlated but overlapping RGB,
    so labels follow real geometric context rather than a position
    formula.  Features = [rgb/255, pos] (the S3DIS 6-channel input)."""
    import numpy as np

    from crfconv_tpu.data.datasets.s3dis import CLASS_NAMES
    from crfconv_tpu.parity.synthetic import _BASE_RGB, _make_room

    pos = np.empty((batch, N, 3), np.float32)
    x = np.empty((batch, N, 6), np.float32)
    y = np.empty((batch, N), np.int64)
    for b in range(batch):
        parts = _make_room(rng, int(N * 1.2))
        xyz = np.concatenate([p for _, p in parts], axis=0)
        cls = np.concatenate(
            [np.full(p.shape[0], CLASS_NAMES[c]) for c, p in parts]
        )
        rgb = np.concatenate(
            [
                np.clip(
                    np.asarray(_BASE_RGB[c], np.float64)[None]
                    + rng.normal(0, 22, (p.shape[0], 3)),
                    0, 255,
                )
                for c, p in parts
            ],
            axis=0,
        )
        take = rng.choice(xyz.shape[0], N, replace=False)
        p = xyz[take]
        p = (p - p.min(0)) / max(float((p.max(0) - p.min(0)).max()), 1e-6)
        pos[b] = p
        y[b] = cls[take]
        x[b] = np.concatenate([rgb[take] / 255.0, p], axis=-1)
    return pos, x, y.astype(np.int32)


def sample_cloud(rng, anchors, emb, task, batch):
    import numpy as np

    if task == "rooms":
        return sample_cloud_rooms(rng, batch)
    pos = rng.random((batch, N, 3), dtype=np.float32)
    y = labels_for(pos, anchors, task)
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


def edge_recall(tile, pad, seed=0):
    """Fraction of exact kNN(16) edges the window search recovers."""
    import numpy as np
    from scipy.spatial import cKDTree

    from crfconv_tpu.ops.morton import morton_order_np
    from crfconv_tpu.ops.windowed import window_knn
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    p = rng.random((N, 3)).astype(np.float32)
    p = p[morton_order_np(p)]
    idx = np.asarray(
        window_knn(jnp.asarray(p[None]), 16, tile=tile, pad=pad)
    )[0]
    _, exact = cKDTree(p).query(p, k=16)
    rec = np.mean([
        len(set(idx[i]) & set(exact[i])) / 16.0 for i in range(0, N, 7)
    ])
    return float(rec)


def run(mode, task, seed, tile=64, pad=128, knn_exact=True,
        jitter=False, views=1):
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
    anchors, emb = make_world(rng, task)
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
        to_batch(*sample_cloud(rng, anchors, emb, task, B))
        for _ in range(TRAIN_BATCHES)
    ]
    val_batches = [
        to_batch(*sample_cloud(rng, anchors, emb, task, B))
        for _ in range(VAL_BATCHES)
    ]

    with neighbor_mode(mode, tile=tile, pad=pad, knn_exact=knn_exact):
        model = PointConvResNet(n_classes=N_CLASSES, use_crf=True, steps=1)
        tx = make_optimizer(lr=0.01)
        example = train_batches[0]
        if windowed:
            example = build_windowed_batch(example, jax.random.PRNGKey(0))
        state = create_train_state(model, example, tx, seed=seed)
        tstep = jax.jit(
            make_train_step(model, windowed=windowed, curve_jitter=jitter),
            donate_argnums=(0,),
        )
        estep = jax.jit(
            make_eval_step(model, windowed=windowed, eval_views=views)
        )

        def val_miou(state):
            confusion = None
            for batch in val_batches:
                out = estep(state, batch)
                confusion = (
                    out["confusion"] if confusion is None
                    else confusion + out["confusion"]
                )
            scores, _ = scores_from_confusion(np.asarray(confusion))
            return float(scores["Mean IoU"])

        key = jax.random.PRNGKey(seed)
        best, best_epoch = 0.0, -1
        for epoch in range(MAX_EPOCHS):
            for batch in train_batches:
                key, sub = jax.random.split(key)
                state, m = tstep(state, batch, sub)
            miou = val_miou(state)
            if miou > best:
                best, best_epoch = miou, epoch
            if epoch - best_epoch >= PATIENCE:
                break  # converged: no val improvement for PATIENCE epochs
    return best, best_epoch + 1


ARMS = [
    # (key, mode, tile, pad, knn_exact)
    ("exact", "exact", 64, 128, True),
    ("win-t64-p64", "windowed", 64, 64, True),
    ("win-t64-p128", "windowed", 64, 128, True),
    ("win-t64-p192", "windowed", 64, 192, True),
    ("win-t64-p128-packed", "windowed", 64, 128, False),
]

# Round-4 arms (VERDICT r3 #1): train-time curve-orientation jitter and
# eval-time orientation ensembling, at the packed production geometry.
# (key, mode, tile, pad, knn_exact, jitter, views)
ARMS_R4 = [
    ("exact", "exact", 64, 128, True, False, 1),
    ("win-packed", "windowed", 64, 128, False, False, 1),
    ("win-jitter", "windowed", 64, 128, False, True, 1),
    ("win-2view", "windowed", 64, 128, False, False, 2),
    ("win-jitter-2view", "windowed", 64, 128, False, True, 2),
]


def main_r4(tasks=("slabs",)):
    """Round-4 study: does jitter / 2-view eval close the cross-tile gap?

    Runs the slabs task (the adversarial case; voronoi was already at
    parity in r3) over the r4 arms and prints the same delta/CI summary.
    """
    import numpy as np

    results = {}
    for task in tasks:
        for seed in SEEDS:
            for key, mode, tile, pad, kx, jit_, views in ARMS_R4:
                miou, epochs = run(
                    mode, task, seed, tile, pad, kx,
                    jitter=jit_, views=views,
                )
                results.setdefault(task, {}).setdefault(key, []).append(
                    round(miou, 4)
                )
                print(
                    f"# {task} seed {seed} {key}: best mIoU {miou:.4f} "
                    f"(stopped after {epochs} epochs)",
                    file=sys.stderr, flush=True,
                )

    out = {
        "metric": "r4 windowed-fix arms vs exact BEST val mIoU "
        f"({len(SEEDS)} seeds, early-stopped; jitter = train-time random "
        "curve orientation, 2view = eval-time orientation ensemble)",
        "results": results,
    }
    for task, arms in results.items():
        for key, vals in arms.items():
            if key == "exact":
                continue
            d = np.array(vals) - np.array(arms["exact"])
            ci = 1.96 * d.std(ddof=1) / np.sqrt(len(d))
            out[f"{task}:{key}:delta"] = round(float(d.mean()), 4)
            out[f"{task}:{key}:ci95"] = round(float(ci), 4)
    print(json.dumps(out))


def main():
    import numpy as np

    recalls = {
        f"t64-p{pad}": round(edge_recall(64, pad), 4)
        for pad in (64, 128, 192)
    }
    print(f"# edge recall: {recalls}", file=sys.stderr, flush=True)

    results = {}
    for task in ("voronoi", "slabs"):
        for seed in SEEDS:
            for key, mode, tile, pad, kx in ARMS:
                miou, epochs = run(mode, task, seed, tile, pad, kx)
                results.setdefault(task, {}).setdefault(key, []).append(
                    round(miou, 4)
                )
                print(
                    f"# {task} seed {seed} {key}: best mIoU {miou:.4f} "
                    f"(stopped after {epochs} epochs)",
                    file=sys.stderr, flush=True,
                )

    out = {
        "metric": "windowed vs exact BEST val mIoU (early-stopped, "
        f"{len(SEEDS)} seeds, tasks: Morton-local voronoi + "
        "cross-tile slanted slabs)",
        "edge_recall": recalls,
        "results": results,
    }
    for task, arms in results.items():
        ex = np.mean(arms["exact"])
        for key, vals in arms.items():
            if key == "exact":
                continue
            d = np.array(vals) - np.array(arms["exact"])
            ci = 1.96 * d.std(ddof=1) / np.sqrt(len(d))
            out[f"{task}:{key}:delta"] = round(float(d.mean()), 4)
            out[f"{task}:{key}:ci95"] = round(float(ci), 4)
    print(json.dumps(out))


def main_r5(tasks=("slabs", "voronoi", "rooms")):
    """Round-5 study (VERDICT r4 #4): harden the windowed-default
    evidence — the 2-view arm on BOTH original tasks plus the
    structured-rooms task (real room geometry, not a position formula).
    Arms: exact baseline, windowed-packed single view, windowed-packed
    2-view (the shipped default config).  Writes
    benchmarks/results_windowed_accuracy_r5.json.
    """
    import numpy as np

    arms = [
        ("exact", "exact", 64, 128, True, False, 1),
        ("win-packed", "windowed", 64, 128, False, False, 1),
        ("win-2view", "windowed", 64, 128, False, False, 2),
    ]
    results = {}
    for task in tasks:
        for seed in SEEDS:
            for key, mode, tile, pad, kx, jit_, views in arms:
                miou, epochs = run(
                    mode, task, seed, tile, pad, kx,
                    jitter=jit_, views=views,
                )
                results.setdefault(task, {}).setdefault(key, []).append(
                    round(miou, 4)
                )
                print(
                    f"# {task} seed {seed} {key}: best mIoU {miou:.4f} "
                    f"(stopped after {epochs} epochs)",
                    file=sys.stderr, flush=True,
                )
    out = {
        "metric": "r5 windowed-default evidence: exact vs windowed "
        f"1-view vs 2-view BEST val mIoU ({len(SEEDS)} seeds, "
        "early-stopped; tasks: slabs = adversarial cross-tile, voronoi "
        "= Morton-local, rooms = structured office geometry)",
        "results": results,
    }
    for task, arms_r in results.items():
        for key, vals in arms_r.items():
            if key == "exact":
                continue
            d = np.array(vals) - np.array(arms_r["exact"])
            ci = 1.96 * d.std(ddof=1) / np.sqrt(len(d))
            out[f"{task}:{key}:delta"] = round(float(d.mean()), 4)
            out[f"{task}:{key}:ci95"] = round(float(ci), 4)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_windowed_accuracy_r5.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--r5" in sys.argv:
        main_r5()
    elif "--r4" in sys.argv:
        tasks = ("slabs", "voronoi") if "--all-tasks" in sys.argv else (
            "slabs",
        )
        main_r4(tasks)
    else:
        main()
