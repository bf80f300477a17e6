"""Decompose the windowed TRAIN step cost on TPU (r4 perf work).

The r3/r4 numbers: windowed inference runs 4.4-4.5 M pts/s (fused
eval-mode kernels) but the train step does 52.6 ms at B8x8192
(1.24 M pts/s) — training cannot use the fused point-conv kernel
because train-mode BatchNorm needs global batch statistics mid-MLP
(ops/conv_pallas.py docstring).  Before attacking that with a
multi-pass train kernel, measure where the 52.6 ms actually goes:

  pyramid          on-device windowed pyramid build (+ feature sort)
  fwd_train        train-mode forward + loss (unfused funnel, BN stats)
  fwd_eval         eval-mode forward (fused kernels) for reference
  fwd+bwd          value_and_grad of the loss
  full step        fwd+bwd + optimizer + BN-stat update (the 52.6 ms)
  no-CRF variants  isolate the CRF decoder's train cost
  gather fwd/bwd   scale-0 windowed_gather at train shapes

Usage (TPU): python benchmarks/train_profile.py [--points 8192]
Writes benchmarks/train_profile.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crfconv_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

BATCH = 8
IN_CHANNELS = 6
N_CLASSES = 13


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfconv_tpu.data.batch import RawBatch
    from crfconv_tpu.models import PointConvResNet
    from crfconv_tpu.ops.neighbors import neighbor_mode
    from crfconv_tpu.ops.windowed import windowed_gather
    from crfconv_tpu.train.train_state import (
        build_windowed_batch,
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from crfconv_tpu.train.losses import segmentation_loss
    from crfconv_tpu.utils import device_time

    N = args.points
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((BATCH, N, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((BATCH, N, IN_CHANNELS), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, N_CLASSES, (BATCH, N)), jnp.int32)
    raw = RawBatch(pos=pos, x=feats, y=labels)
    results = {}

    def put(name, seconds):
        ms = seconds * 1e3
        pps = BATCH * N / seconds
        results[name] = {"ms": round(ms, 2), "pts_per_sec": round(pps, 1)}
        print(f"{name:28s} {ms:8.2f} ms   {pps/1e6:6.2f} M pts/s", flush=True)

    quick = bool(os.environ.get("CRFCONV_PROFILE_QUICK"))
    with neighbor_mode("windowed", knn_exact=False):
        for use_crf, tag in (((True, ""),) if quick
                             else ((True, ""), (False, "-nocrf"))):
            model = PointConvResNet(
                n_classes=N_CLASSES, use_crf=use_crf, steps=1
            )
            example = build_windowed_batch(raw, jax.random.PRNGKey(0))
            tx = make_optimizer(lr=0.01)
            state = create_train_state(model, example, tx, seed=0)

            # pyramid build only (carry: positions)
            # state/feats/labels ride through env as jit arguments —
            # closed-over device arrays cost a per-leaf device fetch at
            # lowering time (utils/benchtools.py)
            env = (state, feats, labels)

            def pyr_step(carry, env):
                st, fts, lbl = env
                p, key = carry
                key, sub = jax.random.split(key)
                b = build_windowed_batch(
                    RawBatch(pos=p, x=fts, y=lbl), sub
                )
                return (p + 1e-9 * b.scales[0].pos, key)

            if use_crf:
                put(
                    "pyramid+sort",
                    device_time(
                        pyr_step, (pos, jax.random.PRNGKey(1)),
                        iters=args.iters, env=env,
                    ),
                )

            # train-mode forward + loss (no grad)
            def fwd_step(carry, env):
                st, fts, lbl = env
                p, key = carry
                key, pk, dk = jax.random.split(key, 3)
                b = build_windowed_batch(RawBatch(pos=p, x=fts, y=lbl), pk)
                out, _ = model.apply(
                    {"params": st.params,
                     "batch_stats": st.batch_stats},
                    b, train=True, rngs={"dropout": dk},
                    mutable=["batch_stats"],
                )
                loss = segmentation_loss(out, b.y, None, -1)
                return (p + 1e-9 * loss, key)

            put(
                f"fwd-train{tag}",
                device_time(
                    fwd_step, (pos, jax.random.PRNGKey(2)),
                    iters=args.iters, env=env,
                ),
            )

            # eval-mode forward (fused kernels)
            def eval_step(carry, env):
                st, fts, lbl = env
                p, key = carry
                key, pk = jax.random.split(key)
                b = build_windowed_batch(RawBatch(pos=p, x=fts, y=lbl), pk)
                out = model.apply(
                    {"params": st.params,
                     "batch_stats": st.batch_stats},
                    b, train=False,
                )
                return (p + 1e-9 * out[..., :3], key)

            put(
                f"fwd-eval{tag}",
                device_time(
                    eval_step, (pos, jax.random.PRNGKey(3)),
                    iters=args.iters, env=env,
                ),
            )

            # fwd + bwd (no optimizer)
            def grad_step(carry, env):
                st, fts, lbl = env
                p, key = carry
                key, pk, dk = jax.random.split(key, 3)
                b = build_windowed_batch(RawBatch(pos=p, x=fts, y=lbl), pk)

                def loss_fn(params):
                    out, upd = model.apply(
                        {"params": params,
                         "batch_stats": st.batch_stats},
                        b, train=True, rngs={"dropout": dk},
                        mutable=["batch_stats"],
                    )
                    return segmentation_loss(out, b.y, None, -1)

                loss, grads = jax.value_and_grad(loss_fn)(st.params)
                g0 = jax.tree_util.tree_leaves(grads)[0]
                return (p + 1e-9 * loss + 0 * g0.ravel()[0], key)

            put(
                f"fwd+bwd{tag}",
                device_time(
                    grad_step, (pos, jax.random.PRNGKey(4)),
                    iters=args.iters, env=env,
                ),
            )

            # full train step
            tstep = make_train_step(model, windowed=True)

            def full_step(carry, env):
                st, key = carry
                key, sub = jax.random.split(key)
                st, m = tstep(st, env, sub)
                # fold the metrics into the carry so XLA can't dead-code
                # -eliminate the confusion/loss computation the production
                # step pays for (ADVICE r4); 1e-30 keeps the perturbation
                # far below f32 resolution of any real parameter
                bump = 1e-30 * (
                    m["loss"] + m["confusion"].ravel()[0].astype(jnp.float32)
                )
                st = st.replace(
                    params=jax.tree_util.tree_map(
                        lambda a: a + bump.astype(a.dtype), st.params
                    )
                )
                return (st, key)

            put(
                f"full-step{tag}",
                device_time(
                    full_step, (state, jax.random.PRNGKey(5)),
                    iters=args.iters, env=raw,
                ),
            )

        # scale-0 gather micro: F = 3 + hidden(8) at conv1, K=16
        if quick:
            out_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "train_profile.json",
            )
            with open(out_path, "w") as f:
                json.dump(
                    {"batch": BATCH, "points": N, "results": results},
                    f, indent=1,
                )
            print(f"wrote {out_path}")
            return
        mode_tile, mode_pad = 64, 128
        idx = np.clip(
            np.arange(N)[None, :, None] + rng.integers(-96, 96, (1, N, 16)),
            0, N - 1,
        ).astype(np.int32)
        idx = jnp.asarray(np.broadcast_to(idx, (BATCH, N, 16)).copy())
        for F in (11, 16, 35):
            xs = jnp.asarray(
                rng.random((BATCH, N, F), dtype=np.float32)
            )

            def g_step(carry, ix):
                x, k = carry
                g = windowed_gather(x, ix, mode_tile, mode_pad)
                return (x + 1e-9 * g[:, :, 0, :], k)

            put(
                f"gather-fwd F={F}",
                device_time(
                    g_step, (xs, jax.random.PRNGKey(6)),
                    iters=args.iters, env=idx,
                ),
            )

            def gb_step(carry, ix):
                x, k = carry

                def f(xx):
                    return jnp.sum(
                        windowed_gather(xx, ix, mode_tile, mode_pad) ** 2
                    )

                gr = jax.grad(f)(x)
                return (x + 1e-9 * gr, k)

            put(
                f"gather-fwd+bwd F={F}",
                device_time(
                    gb_step, (xs, jax.random.PRNGKey(7)),
                    iters=args.iters, env=idx,
                ),
            )

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "train_profile.json"
    )
    with open(out_path, "w") as f:
        json.dump(
            {"batch": BATCH, "points": N, "results": results}, f, indent=1
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
