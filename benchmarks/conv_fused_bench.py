"""A/B: fused windowed point-conv inference kernel vs the unfused path.

Times the whole PointConv module (eval mode) at the scale-0/1 model
shapes with FUSED_MAX_H disarmed vs armed, so the measurement includes
everything the fusion removes (gather kernel + [B,N,K,*] HBM round
trips) and everything it adds (in-kernel MLP matmuls).

Run: JAX_PLATFORMS=axon python benchmarks/conv_fused_bench.py
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

# (label, B, N, K, hidden)
SHAPES = [
    ("s3dis-scale0", 8, 8192, 16, 8),
    ("s3dis-scale1", 8, 2048, 16, 16),
    ("sem3d-scale0", 8, 65536, 16, 8),
    ("sem3d-scale1", 8, 16384, 16, 16),
    ("sem3d-scale0-h32", 8, 65536, 16, 32),
]

# (label, B, N, M, K, hidden, R) — strided blocks with the residual
# max-pool rider (flagship conv2_1..conv5_1 at S3DIS / Semantic3D size)
STRIDED_SHAPES = [
    ("s3dis-str2", 8, 8192, 2048, 16, 16, 64),
    ("s3dis-str3", 8, 2048, 512, 16, 32, 128),
    ("sem3d-str2", 8, 65536, 16384, 16, 16, 64),
    ("sem3d-str3", 8, 16384, 4096, 16, 32, 128),
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfconv_tpu.models.point_conv_big import PointConv
    from crfconv_tpu.ops import conv_pallas
    from crfconv_tpu.ops.neighbors import neighbor_mode
    from crfconv_tpu.utils import device_time

    rng = np.random.default_rng(0)
    results = {}
    for label, B, N, K, H in SHAPES:
        pos = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
        x = jnp.asarray(
            rng.standard_normal((B, N, H)).astype(np.float32)
        )
        idx = jnp.asarray(
            np.clip(
                np.arange(N)[None, :, None]
                + rng.integers(-96, 96, (B, N, K)),
                0, N - 1,
            ).astype(np.int32)
        )
        model = PointConv(d_model=H)
        with neighbor_mode("windowed"):
            variables = model.init(
                jax.random.PRNGKey(0), x, pos, idx, train=False
            )

            results[label] = {}
            for armed in (0, 128):
                conv_pallas.FUSED_MAX_H = armed
                # engage the kernel even at small row counts so the A/B
                # informs the production FUSED_MIN_ROWS threshold
                conv_pallas.FUSED_MIN_ROWS = 0 if armed else 1 << 30

                def step(carry, idx=idx, variables=variables, model=model):
                    out = model.apply(
                        variables, carry, pos, idx, train=False
                    )
                    return carry + 1e-9 * out

                t = device_time(step, x, iters=10)
                key = "fused" if armed else "unfused"
                results[label][key] = round(t * 1e3, 3)
                print(
                    f"# {label} [{key}]: {t * 1e3:.3f} ms",
                    file=sys.stderr, flush=True,
                )
            # parity on device
            conv_pallas.FUSED_MAX_H = 0
            conv_pallas.FUSED_MIN_ROWS = 1 << 30
            ref = model.apply(variables, x, pos, idx, train=False)
            conv_pallas.FUSED_MAX_H = 128
            conv_pallas.FUSED_MIN_ROWS = 0
            got = model.apply(variables, x, pos, idx, train=False)
            conv_pallas.FUSED_MAX_H = 0
            err = float(
                jnp.max(jnp.abs(got - ref))
                / (jnp.max(jnp.abs(ref)) + 1e-9)
            )
            results[label]["rel_err"] = err
            print(f"# {label} rel_err {err:.2e}", file=sys.stderr, flush=True)

    for label, B, N, M, K, H, R in STRIDED_SHAPES:
        pos = jnp.asarray(
            np.sort(rng.random((B, N, 3), dtype=np.float32), axis=1)
        )
        sub_pos = pos[:, :: N // M]
        x = jnp.asarray(rng.standard_normal((B, N, H)).astype(np.float32))
        res = jnp.asarray(rng.standard_normal((B, N, R)).astype(np.float32))
        stride = N // M
        idx = jnp.asarray(
            np.clip(
                (np.arange(M) * stride)[None, :, None]
                + rng.integers(-96, 96, (B, M, K)),
                0, N - 1,
            ).astype(np.int32)
        )
        model = PointConv(d_model=H)
        with neighbor_mode("windowed"):
            variables = model.init(
                jax.random.PRNGKey(0), x, pos, idx,
                sub_pos=sub_pos, extra=res, train=False,
            )

            results[label] = {}
            for armed in (0, 128):
                conv_pallas.FUSED_MAX_H = armed
                # engage the kernel even at small row counts so the A/B
                # informs the production FUSED_MIN_ROWS threshold
                conv_pallas.FUSED_MIN_ROWS = 0 if armed else 1 << 30

                def step(carry, idx=idx, variables=variables, model=model,
                         sub_pos=sub_pos, res=res):
                    out, res_max = model.apply(
                        variables, carry, pos, idx,
                        sub_pos=sub_pos, extra=res, train=False,
                    )
                    bump = jnp.sum(out) + jnp.sum(res_max)
                    return carry + 1e-12 * bump

                t = device_time(step, x, iters=10)
                key = "fused" if armed else "unfused"
                results[label][key] = round(t * 1e3, 3)
                print(
                    f"# {label} [{key}]: {t * 1e3:.3f} ms",
                    file=sys.stderr, flush=True,
                )
            conv_pallas.FUSED_MAX_H = 0
            conv_pallas.FUSED_MIN_ROWS = 1 << 30
            ref, ref_r = model.apply(
                variables, x, pos, idx, sub_pos=sub_pos, extra=res,
                train=False,
            )
            conv_pallas.FUSED_MAX_H = 128
            conv_pallas.FUSED_MIN_ROWS = 0
            got, got_r = model.apply(
                variables, x, pos, idx, sub_pos=sub_pos, extra=res,
                train=False,
            )
            conv_pallas.FUSED_MAX_H = 0
            err = float(
                jnp.max(jnp.abs(got - ref))
                / (jnp.max(jnp.abs(ref)) + 1e-9)
            )
            err_r = float(
                jnp.max(jnp.abs(got_r - ref_r))
                / (jnp.max(jnp.abs(ref_r)) + 1e-9)
            )
            results[label]["rel_err"] = err
            results[label]["rel_err_rider"] = err_r
            print(
                f"# {label} rel_err {err:.2e} rider {err_r:.2e}",
                file=sys.stderr, flush=True,
            )
    print(json.dumps({"metric": "fused point-conv A/B", **results}))


if __name__ == "__main__":
    main()
