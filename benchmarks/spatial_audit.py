"""Spatial-sharding audit at Semantic3D scale (VERDICT r2 #8).

Two questions, answered with compiled artifacts rather than assertions:

1. Does per-device memory actually drop ~D× when the point axis is
   sharded?  Compare XLA's compiled memory analysis for the halo
   shard_map CRF vs the same op unsharded.
2. Where does the GSPMD route (shard_points + plain jit, the r2 story)
   actually communicate?  Pallas calls have no partitioning rule, so
   GSPMD must all-gather their operands — this script counts the
   all-gathers to document why the explicit shard_map path exists.

Runs on the 8-virtual-device CPU mesh (no TPU pod needed):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/spatial_audit.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# raise the CPU collective rendezvous abort timeout: on a 1-core host the
# scheduler can starve one of 8 device threads past XLA's 40 s default
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        " --xla_cpu_collective_timeout_seconds=3600"
    )
os.environ["XLA_FLAGS"] = flags

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import json
import re

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from crfconv_tpu.ops.crf import crf_mean_field
    from crfconv_tpu.ops.neighbors import neighbor_mode
    from crfconv_tpu.parallel import crf_mean_field_spatial, make_mesh

    assert jax.device_count() >= 8
    mesh = make_mesh(8)

    # Semantic3D decoder scale: B=8, N=65536, H=8, K=16 (flagship deconv1)
    B, N, H, K = 8, 65536, 8, 16
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    logits = rng.standard_normal((B, N, K)).astype(np.float32)
    s = jnp.asarray(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    idx = jnp.asarray(
        np.clip(
            np.arange(N)[None, :, None]
            + rng.integers(-128, 128, (B, N, K)),
            0, N - 1,
        ),
        jnp.int32,
    )
    c = jnp.asarray(
        np.eye(H) + 0.1 * rng.standard_normal((H, H)), jnp.float32
    )

    report = {}
    with neighbor_mode("windowed"):
        # ---- halo shard_map path ----
        def spatial(z, s, idx, c):
            return crf_mean_field_spatial(
                z, s, idx, c, mesh, steps=1, allow_fused=False
            )

        comp = jax.jit(spatial).lower(z, s, idx, c).compile()
        mem = comp.memory_analysis()
        text = comp.as_text()
        report["halo_shard_map"] = {
            "per_device_temp_MB": round(
                mem.temp_size_in_bytes / 2**20, 1
            ),
            "per_device_arg_MB": round(
                mem.argument_size_in_bytes / 2**20, 1
            ),
            "collective_permutes": len(
                re.findall(r"collective-permute", text)
            ),
            "all_gathers": len(re.findall(r"all-gather", text)),
        }

        # ---- unsharded single-device reference ----
        comp1 = (
            jax.jit(
                lambda z, s, idx, c: crf_mean_field(z, s, idx, c, steps=1)
            )
            .lower(z, s, idx, c)
            .compile()
        )
        mem1 = comp1.memory_analysis()
        report["unsharded"] = {
            "temp_MB": round(mem1.temp_size_in_bytes / 2**20, 1),
            "arg_MB": round(mem1.argument_size_in_bytes / 2**20, 1),
        }

        # ---- correctness at scale (executed, not just compiled) ----
        out = spatial(z, s, idx, c)
        ref = crf_mean_field(z, s, idx, c, steps=1)
        report["max_abs_delta"] = float(
            jnp.max(jnp.abs(out - ref))
        )

        # ---- FULL spatial forward (parallel/spatial_forward.py) ----
        # flagship at Semantic3D shape, point-sharded 8 ways; compiled
        # memory + collective census vs the unsharded forward.  B=1 keeps
        # the CPU-mesh compile tractable; the per-device story is
        # per-cloud and scales linearly in B.
        from crfconv_tpu.data.batch import PointBatch
        from crfconv_tpu.models import PointConvResNet
        from crfconv_tpu.ops.windowed import build_pyramid_windowed
        from crfconv_tpu.parallel import make_spatial_forward

        nf = 65536
        posf = jnp.asarray(rng.random((1, nf, 3)), jnp.float32)
        xf = jnp.asarray(rng.random((1, nf, 6)), jnp.float32)
        order, scales = build_pyramid_windowed(
            posf, key=jax.random.PRNGKey(2)
        )
        wb = PointBatch(
            x=jnp.take_along_axis(xf, order[..., None], axis=1),
            y=None, scales=scales,
        )
        model = PointConvResNet(n_classes=8, use_crf=True, steps=1)
        wvars = model.init(
            {"params": jax.random.PRNGKey(3),
             "dropout": jax.random.PRNGKey(4)},
            wb, train=False,
        )
        fn, info = make_spatial_forward(model, mesh, wb)
        compf = fn.jitted.lower(wvars, wb).compile()
        memf = compf.memory_analysis()
        textf = compf.as_text()
        # fat all-gather = one whose result names a dimension >= 32768
        # (a scale-0/1-sized array); the design only ever gathers the
        # tiny replicated coarse scales
        fat = [
            m
            for m in re.findall(r"all-gather[^\n]*=\s*\S*\[([0-9,]+)\]", textf)
            if any(int(d) >= 32768 for d in m.split(","))
        ]
        report["full_forward_spatial"] = {
            "sharded_scales": info["sharded_scales"],
            "replicated_scales": info["replicated_scales"],
            "per_device_temp_MB": round(memf.temp_size_in_bytes / 2**20, 1),
            "collective_permutes": len(
                re.findall(r"collective-permute", textf)
            ),
            "all_gathers": len(re.findall(r"all-gather", textf)),
            "fat_all_gathers": len(fat),
        }
        compu = (
            jax.jit(lambda v, b: model.apply(v, b, train=False))
            .lower(wvars, wb)
            .compile()
        )
        report["full_forward_unsharded"] = {
            "temp_MB": round(
                compu.memory_analysis().temp_size_in_bytes / 2**20, 1
            ),
        }
        # executed equality at scale
        outf = fn(wvars, wb)
        reff = model.apply(wvars, wb, train=False)
        report["full_forward_max_abs_delta"] = float(
            jnp.max(jnp.abs(outf - reff))
        )

        # ---- point-sharded TRAIN step (parallel/spatial_train.py) ----
        from crfconv_tpu.parallel.spatial_train import make_spatial_train_step
        from crfconv_tpu.train.train_state import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        yb = jnp.asarray(rng.integers(0, 8, (1, nf)), jnp.int32)
        tb = wb._replace(y=yb)
        tx = make_optimizer(lr=0.01, steps_per_epoch=10)
        tstate = create_train_state(model, tb, tx, seed=0)
        sp_step = make_spatial_train_step(model, mesh, tb)
        compt = sp_step.jitted.lower(
            tstate, tb, jax.random.PRNGKey(0)
        ).compile()
        textt = compt.as_text()
        report["train_step_spatial"] = {
            "per_device_temp_MB": round(
                compt.memory_analysis().temp_size_in_bytes / 2**20, 1
            ),
            "collective_permutes": len(
                re.findall(r"collective-permute", textt)
            ),
            "all_gathers": len(re.findall(r"all-gather", textt)),
        }
        ref_step = jax.jit(make_train_step(model))
        comptu = ref_step.lower(
            tstate, tb, jax.random.PRNGKey(0)
        ).compile()
        report["train_step_unsharded"] = {
            "temp_MB": round(
                comptu.memory_analysis().temp_size_in_bytes / 2**20, 1
            ),
        }

    print(json.dumps(report))


if __name__ == "__main__":
    main()
