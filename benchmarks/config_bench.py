"""All-five BASELINE.json config benchmark (VERDICT r3 #2).

One measured row per BASELINE.json config, each with our TPU windowed
measurement (inference AND train step, device_time chained-loop
protocol) and a plain-torch CPU re-execution of the reference math at
the same workload shape (forward AND train step) as the only baseline
measurable in this environment (no GPU / torch_geometric here;
BASELINE.md).  Rows:

  shapenet-partseg   configs[0]: CRFSegNet_Part, B16 x 2048, steps=10
                     (reference configure.py:50-70)
  s3dis              configs[1]: measured by bench.py (the headline row)
  semantic3d         configs[2]: PointConvBig, B16 x 65536, steps=1
                     (configure.py:133-158; lax.map microbatch 8)
  scannet-crf        configs[3]A: CRFSegNet, B16 x 8192, steps=10
                     (configure.py:109-130)
  scannet-discrete   configs[3]B: BaselineDiscreteCRFSegNet, same shape
                     (the discrete CRF A/B, models/discrete_crf_conv.py)
  semantickitti      configs[4]: PointConvBig, B8 x 65536, 4-channel,
                     steps=1 (streaming scan shape)

The steps=10 and discrete rows exercise the fused CRF backwards on
hardware.  Torch baselines are cached in torch_baseline_configs.json
(committed) so the driver's bench run doesn't re-measure them.

Run: python benchmarks/config_bench.py            (all rows, prints JSON)
     imported by bench.py to embed rows in the headline line.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crfconv_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

BASELINE_CONFIG_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "torch_baseline_configs.json",
)

# (model_name, batch, points, in_channels, n_classes, steps, micro)
CONFIG_SHAPES = {
    # micro (last field) also caps the TRAIN row's batch: the steps=10
    # scan-CRF backward at B16 exceeds one chip's HBM (34 G measured r5)
    # — the reference trains crops anyway, so train measures at B8
    "shapenet-partseg": ("CRFSegNet_Part", 16, 2048, 6, 50, 10, 8),
    "semantic3d": ("PointConvBig", 16, 65536, 6, 8, 1, 8),
    "scannet-crf": ("CRFSegNet", 16, 8192, 6, 20, 10, 8),
    "scannet-discrete": ("BaselineDiscreteCRFSegNet", 16, 8192, 6, 20, 10, 8),
    "semantickitti": ("PointConvBig", 8, 65536, 4, 19, 1, 0),
}


def _build_model(model_name, n_classes, steps):
    from crfconv_tpu.models import (
        BaselineDiscreteCRFSegNet,
        CRFSegNet,
        CRFSegNet_Part,
        PointConvResNet,
    )

    if model_name == "PointConvBig":
        return PointConvResNet(n_classes=n_classes, use_crf=True, steps=steps)
    if model_name == "CRFSegNet_Part":
        return CRFSegNet_Part(n_classes=n_classes, steps=steps)
    if model_name == "CRFSegNet":
        return CRFSegNet(n_classes=n_classes, steps=steps)
    if model_name == "BaselineDiscreteCRFSegNet":
        return BaselineDiscreteCRFSegNet(n_classes=n_classes, steps=steps)
    raise ValueError(model_name)


def measure_infer(key: str) -> float:
    """points/sec, windowed e2e (on-device pyramid + forward), one chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfconv_tpu.data.batch import PointBatch
    from crfconv_tpu.ops.neighbors import neighbor_mode
    from crfconv_tpu.ops.windowed import build_pyramid_windowed
    from crfconv_tpu.utils import device_time

    model_name, B, N, C_in, n_cls, steps, micro = CONFIG_SHAPES[key]
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((B, N, C_in), dtype=np.float32))
    category = (
        jnp.asarray(rng.integers(0, 16, (B,)), jnp.int32)
        if model_name == "CRFSegNet_Part"
        else None
    )
    model = _build_model(model_name, n_cls, steps)
    nc = max(B // micro, 1) if micro else 1
    mb = min(B, micro) if micro else B

    with neighbor_mode("windowed", knn_exact=False):

        def make_batch(pos_c, x_c, cat_c, key):
            order, scales = build_pyramid_windowed(pos_c, key=key)
            x = jnp.take_along_axis(x_c, order[..., None], axis=1)
            return PointBatch(x=x, y=None, scales=scales, category=cat_c)

        b0 = make_batch(
            pos[:mb], feats[:mb],
            None if category is None else category[:mb],
            jax.random.PRNGKey(0),
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            b0, train=False,
        )

        def fwd(vrs, pos_c, x_c, cat_c, key):
            out = model.apply(
                vrs, make_batch(pos_c, x_c, cat_c, key), train=False
            )
            return out[-1] if isinstance(out, (tuple, list)) else out

        # variables/feats/category ride through env as jit arguments —
        # closing over device arrays costs a per-leaf device fetch at
        # lowering time (utils/benchtools.py docstring)
        def step(carry, env):
            vrs, fts, cat_e = env
            p, key = carry
            key, sub = jax.random.split(key)
            if nc > 1:
                keys = jax.random.split(sub, nc)
                cat = (
                    jnp.zeros((nc, mb), jnp.int32) if cat_e is None
                    else cat_e.reshape(nc, mb)
                )
                out = jax.lax.map(
                    lambda a: fwd(vrs, a[0], a[1],
                                  a[2] if cat_e is not None else None,
                                  a[3]),
                    (
                        p.reshape(nc, mb, N, 3),
                        fts.reshape(nc, mb, N, -1),
                        cat,
                        keys,
                    ),
                ).reshape(B, N, -1)
            else:
                out = fwd(vrs, p, fts, cat_e, sub)
            return (p + 1e-9 * out[..., :3], key)

        iters = 4 if N * B >= 16 * 65536 else 8
        t = device_time(
            step, (pos, jax.random.PRNGKey(2)), iters=iters,
            env=(variables, feats, category),
        )
    return B * N / t


# per-row TRAIN batch caps tighter than the infer microbatch: the
# discrete steps=10 train at B8 OOMs HBM by 192M (lane-padded gather rel
# operands, r5 debug); B4 fits
TRAIN_MICRO = {"scannet-discrete": 4}


def measure_train(key: str) -> float:
    """points/sec for the full windowed train step, one chip."""
    import os as _os

    # steps=10 small-family TRAIN programs hit a Mosaic scoped-vmem
    # stack overflow in the fused-CRF backward (helper HTTP 500, r5);
    # measure those rows on the scan-CRF path (see ops/crf.py kill
    # switch).  steps=1 rows never engage the fused CRF anyway.
    _os.environ["CRFCONV_CRF_FUSED"] = "0"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfconv_tpu.data.batch import RawBatch
    from crfconv_tpu.ops.neighbors import neighbor_mode
    from crfconv_tpu.train.train_state import (
        build_windowed_batch,
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from crfconv_tpu.utils import device_time

    model_name, B, N, C_in, n_cls, steps, micro = CONFIG_SHAPES[key]
    # train at the largest per-chip slice that fits (the full Semantic3D
    # B16 x 65536 train step exceeds one v5e HBM; reference trains crops)
    micro = TRAIN_MICRO.get(key, micro)
    if micro and B > micro:
        B = micro
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((B, N, C_in), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, n_cls, (B, N)), jnp.int32)
    category = (
        jnp.asarray(rng.integers(0, 16, (B,)), jnp.int32)
        if model_name == "CRFSegNet_Part"
        else None
    )
    model = _build_model(model_name, n_cls, steps)
    with neighbor_mode("windowed", knn_exact=False):
        raw = RawBatch(pos=pos, x=feats, y=labels, category=category)
        example = build_windowed_batch(raw, jax.random.PRNGKey(0))
        tx = make_optimizer(lr=0.01)
        state = create_train_state(model, example, tx, seed=0)
        tstep = make_train_step(model, windowed=True)

        def step(carry, env):
            st, key = carry
            key, sub = jax.random.split(key)
            st, _ = tstep(st, env, sub)
            return (st, key)

        t = device_time(
            step, (state, jax.random.PRNGKey(1)), iters=4, env=raw
        )
    _os.environ.pop("CRFCONV_CRF_FUSED", None)
    return B * N / t


# ---------------------------------------------------------------------------
# torch CPU baselines (reference math re-execution at the same shapes)
# ---------------------------------------------------------------------------


def _torch_small_model(model_name, C_in, n_cls, steps):
    """Assembled small-family torch net mirroring the reference
    architecture (models/point_conv.py:285-483,491-618) on the dense
    pyramid protocol: 5-stage DSPointConv encoder, knn_interpolate +
    GuideCRF (or plain linear) decoder, classifier head."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from tests.torch_ref import gather_neighbors
    from tests.torch_ref_small import (
        TorchDiscreteCRF,
        TorchDSPointConv,
        TorchGuideCRF,
        TorchMLP001,
    )

    CH = (32, 64, 128, 256, 512)

    def interpolate(x, pos_src, pos_dst, up_idx):
        nx = gather_neighbors(x, up_idx)
        npos = gather_neighbors(pos_src, up_idx)
        d2 = ((pos_dst.unsqueeze(2) - npos) ** 2).sum(-1)
        w = 1.0 / d2.clamp_min(1e-8)
        w = w / w.sum(-1, keepdim=True)
        return (w.unsqueeze(-1) * nx).sum(2)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            convs = []
            cin = C_in
            for ch in CH:
                convs.append(TorchDSPointConv(cin, ch))
                convs.append(TorchDSPointConv(ch, ch))
                cin = ch
            self.convs = nn.ModuleList(convs)

        def forward(self, x, scales):
            feats = []
            for stage, ch in enumerate(CH):
                c1, c2 = self.convs[2 * stage], self.convs[2 * stage + 1]
                if stage == 0:
                    x = c1(x, scales[0]["pos"], scales[0]["neighbor_idx"])
                    x = c2(x, scales[0]["pos"], scales[0]["neighbor_idx"])
                else:
                    s = stage - 1
                    x = c1(
                        x, scales[s]["pos"], scales[s]["sub_idx"],
                        sub_pos=scales[stage]["pos"],
                    )
                    x = c2(
                        x, scales[stage]["pos"],
                        scales[stage]["neighbor_idx"],
                    )
                feats.append(x)
            return feats

    class SmallNet(nn.Module):
        def __init__(self, crf):
            super().__init__()
            self.encoder = Encoder()
            self.crf = crf
            chans = ((4, 256), (3, 128), (2, 64), (1, 32))
            if crf:
                # decoder input dims: 512 from the deepest encoder
                # stage, then each stage's fused output
                cins = (512, 256, 128, 64)
                self.deconv = nn.ModuleList(
                    [TorchGuideCRF(cin, CH[i - 1], ch, steps=steps)
                     for cin, (i, ch) in zip(cins, chans)]
                )
            else:
                self.lin = nn.ModuleList(
                    [TorchMLP001(512, 256), TorchMLP001(256, 128),
                     TorchMLP001(128, 64), TorchMLP001(64, 32)]
                )
            self.fusion = nn.ModuleList(
                [TorchMLP001(ch + CH[i - 1], ch) for i, ch in chans][:-1]
            )

        def forward(self, x, scales):
            feats = self.encoder(x, scales)
            h = feats[4]
            for j, (i, ch) in enumerate(((4, 256), (3, 128), (2, 64),
                                         (1, 32))):
                h = interpolate(
                    h, scales[i]["pos"], scales[i - 1]["pos"],
                    scales[i - 1]["up_idx"],
                )
                if self.crf:
                    h = self.deconv[j](h, feats[i - 1],
                                       scales[i - 1]["neighbor_idx"])
                else:
                    h = self.lin[j](h)
                if i > 1:
                    h = torch.cat([h, feats[i - 1]], dim=-1)
                    h = self.fusion[j](h)
            return torch.cat([h, feats[0]], dim=-1)

    class SegNet(nn.Module):
        def __init__(self):
            super().__init__()
            part = model_name == "CRFSegNet_Part"
            discrete = model_name == "BaselineDiscreteCRFSegNet"
            self.part = part
            self.feature = SmallNet(crf=not discrete)
            hid = 256 if (part or discrete) else 128
            cin = 64 + (16 if part else 0)
            self.fc1 = nn.Linear(cin, hid)
            self.fc2 = nn.Linear(hid, n_cls)
            self.dcrf = (
                TorchDiscreteCRF(n_cls, C_in, steps=steps)
                if discrete else None
            )

        def forward(self, x, scales, category=None, crf_idx=None):
            h = self.feature(x, scales)
            if self.part:
                onehot = F.one_hot(category.long(), 16).float()
                onehot = onehot[:, None, :].expand(-1, h.shape[1], -1)
                h = torch.cat([h, onehot], dim=-1)
            logits = self.fc2(F.relu(self.fc1(h)))
            if self.dcrf is not None:
                p = logits.softmax(-1)
                q = self.dcrf(scales[0]["pos"], p, x, crf_idx)
                return p.clamp_min(1e-12).log(), q.clamp_min(1e-12).log()
            return F.log_softmax(logits, dim=-1)

    return SegNet()


def measure_torch(key: str, train: bool, max_iters: int = 2) -> float:
    """Reference-math re-execution on host CPU at the config shape,
    including its host pyramid build (and kNN(32) graph for the discrete
    CRF, mirroring radius_graph per forward)."""
    import numpy as np
    import torch

    from crfconv_tpu.data.pipeline import build_pyramid

    model_name, B, N, C_in, n_cls, steps, micro = CONFIG_SHAPES[key]
    if train and micro and B > micro:
        B = micro
    torch.set_num_threads(os.cpu_count() or 1)
    rng = np.random.default_rng(0)
    pos = rng.random((B, N, 3), dtype=np.float32)
    x = torch.from_numpy(rng.random((B, N, C_in), dtype=np.float32))
    y = torch.from_numpy(rng.integers(0, n_cls, (B, N))).long()
    category = torch.from_numpy(rng.integers(0, 16, (B,))) \
        if model_name == "CRFSegNet_Part" else None

    if model_name == "PointConvBig":
        from tests.torch_ref import TorchPointConvResNet

        model = TorchPointConvResNet(C_in, n_cls, use_crf=True, steps=steps)
    else:
        model = _torch_small_model(model_name, C_in, n_cls, steps)
    model.train(train)

    needs_crf_idx = model_name == "BaselineDiscreteCRFSegNet"

    def run_once():
        scales = [
            {
                "pos": torch.from_numpy(s.pos),
                "neighbor_idx": torch.from_numpy(s.neighbor_idx).long(),
                "sub_idx": torch.from_numpy(s.sub_idx).long(),
                "up_idx": torch.from_numpy(s.up_idx).long(),
            }
            for s in build_pyramid(pos, rng=rng)
        ]
        kwargs = {}
        if needs_crf_idx:
            from crfconv_tpu.ops.knn_host import knn_batch

            kwargs["crf_idx"] = torch.from_numpy(
                knn_batch(pos, pos, min(32, N)).astype(np.int64)
            )
        if model_name == "PointConvBig":
            args = (x, scales)
        else:
            args = (x, scales)
            if category is not None:
                kwargs["category"] = category
        if not train:
            with torch.no_grad():
                return model(*args, **kwargs)
        out = model(*args, **kwargs)
        heads = out if isinstance(out, tuple) else (out,)
        loss = sum(
            torch.nn.functional.nll_loss(
                h.reshape(-1, n_cls), y.reshape(-1)
            )
            for h in heads
        )
        model.zero_grad()
        loss.backward()
        return loss

    run_once()  # warmup
    t0 = time.perf_counter()
    for _ in range(max_iters):
        run_once()
    dt = (time.perf_counter() - t0) / max_iters
    return B * N / dt


def torch_baselines(keys, refresh=False) -> dict:
    cache = {}
    if os.path.exists(BASELINE_CONFIG_CACHE) and not refresh:
        with open(BASELINE_CONFIG_CACHE) as f:
            cache = json.load(f)
    dirty = False
    for key in keys:
        for kind in ("fwd", "train"):
            ck = f"{key}:{kind}"
            if ck in cache:
                continue
            _, B, N, *_ = CONFIG_SHAPES[key]
            iters = 1 if B * N > 200_000 else 2
            print(f"# measuring torch baseline {ck}...",
                  file=sys.stderr, flush=True)
            try:
                cache[ck] = round(
                    measure_torch(key, train=kind == "train",
                                  max_iters=iters), 1
                )
            except Exception as e:  # record the failure, don't die
                cache[ck] = f"failed: {e!r:.200}"
            dirty = True
    if dirty:
        with open(BASELINE_CONFIG_CACHE, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    return cache


def measure_all(keys=None, deadline=None) -> dict:
    """``deadline``: optional time.monotonic() value after which no NEW
    row is started (rows in flight finish; bench.py passes its budget so
    the whole artifact stays inside the driver's wall clock — skipped
    rows are recorded explicitly, never silently dropped)."""
    import time as _time

    keys = list(keys or CONFIG_SHAPES)
    base = torch_baselines(keys)
    rows = {}
    for key in keys:
        row = {}
        if deadline is not None and _time.monotonic() > deadline:
            rows[key] = {"skipped": "budget exhausted"}
            print(f"# {key}: skipped (budget)", file=sys.stderr, flush=True)
            continue
        try:
            v = measure_infer(key)
            row["pts_per_sec"] = round(v, 1)
            print(f"# {key}: {v:,.0f} pts/s infer", file=sys.stderr,
                  flush=True)
        except Exception as e:
            row["pts_per_sec"] = f"failed: {e!r:.200}"
        try:
            v = measure_train(key)
            row["train_pts_per_sec"] = round(v, 1)
            print(f"# {key}: {v:,.0f} pts/s train", file=sys.stderr,
                  flush=True)
        except Exception as e:
            row["train_pts_per_sec"] = f"failed: {e!r:.200}"
        for kind, col in (("fwd", "torch_cpu_fwd"),
                          ("train", "torch_cpu_train")):
            row[col] = base.get(f"{key}:{kind}")
        if isinstance(row.get("pts_per_sec"), float) and isinstance(
            row.get("torch_cpu_fwd"), (int, float)
        ):
            row["vs_torch_fwd"] = round(
                row["pts_per_sec"] / row["torch_cpu_fwd"], 1
            )
        if isinstance(row.get("train_pts_per_sec"), float) and isinstance(
            row.get("torch_cpu_train"), (int, float)
        ):
            row["vs_torch_train"] = round(
                row["train_pts_per_sec"] / row["torch_cpu_train"], 1
            )
        rows[key] = row
    return rows


if __name__ == "__main__":
    keys = [a for a in sys.argv[1:] if a in CONFIG_SHAPES] or None
    print(json.dumps(measure_all(keys), indent=1))
