"""S3DIS Area-5 mIoU parity runbook (VERDICT r2 #4; BASELINE.json ±0.3).

One command that, given the raw S3DIS dataset, trains BOTH the torch
oracle (a faithful re-execution of the reference recipe,
trainval.py:21-155 + test_s3dis :218-327) and this framework's flagship
on the same room pipeline, runs the labeled vote test for each, and
prints the full-cloud mIoU delta:

    python -m crfconv_tpu.parity --root /data/S3DIS [--epochs 100]

``--dry-run`` builds a tiny synthetic raw corpus and runs the whole
harness end-to-end in minutes — the harness itself is CI-verified now so
the real-data run is one command the moment data is mounted.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Optional

import numpy as np

log = logging.getLogger("crfconv_tpu")

MIOU_TOLERANCE = 0.003  # ±0.3 mIoU points (BASELINE.json north star)


def _scales_to_torch(scales):
    import torch

    return [
        {
            "pos": torch.from_numpy(np.asarray(s.pos)),
            "neighbor_idx": torch.from_numpy(np.asarray(s.neighbor_idx)),
            "sub_idx": (
                None
                if s.sub_idx is None
                else torch.from_numpy(np.asarray(s.sub_idx))
            ),
            "up_idx": (
                None
                if s.up_idx is None
                else torch.from_numpy(np.asarray(s.up_idx))
            ),
        }
        for s in scales
    ]


def run_torch_reference(cfg, dataset, seed: int = 0, num_votes: int = 100):
    """Train + vote-test the torch oracle with the reference recipe:
    SGD(momentum 0.95, wd 1e-4) + per-epoch ExponentialLR(gamma),
    weighted CE (trainval.py:69-73, :101-104), vote smooth 0.95 with the
    labeled-eval projection (test_s3dis)."""
    import torch
    import torch.nn.functional as F

    from crfconv_tpu.data import transforms as T
    from crfconv_tpu.data.loader import MultiscaleLoader
    from crfconv_tpu.parity.oracle import TorchPointConvResNet
    from crfconv_tpu.train.vote import labeled_vote_eval

    torch.manual_seed(seed)
    train_loader = MultiscaleLoader(
        dataset.train_set, cfg.batch_size,
        transform=T.default_train_transform(), seed=seed,
        kernel_sizes=cfg.kernel_sizes, ratios=cfg.ratios, k_up=cfg.k_up,
        device_put=False,
    )
    val_loader = MultiscaleLoader(
        dataset.test_set, cfg.batch_size,
        transform=T.default_test_transform(), seed=seed + 1,
        kernel_sizes=cfg.kernel_sizes, ratios=cfg.ratios, k_up=cfg.k_up,
        device_put=False,
    )
    model = TorchPointConvResNet(
        6, cfg.num_classes, use_crf=cfg.use_crf, steps=cfg.steps
    )
    opt = torch.optim.SGD(
        model.parameters(), lr=cfg.lr, momentum=cfg.momentum,
        weight_decay=cfg.weight_decay,
    )
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=cfg.gamma)
    cw = cfg.class_weights
    cw = None if cw is None else torch.from_numpy(np.asarray(cw, np.float32))

    def to_torch(batch):
        x = torch.from_numpy(np.asarray(batch.x))
        y = (
            None
            if batch.y is None
            else torch.from_numpy(np.asarray(batch.y)).long()
        )
        return x, y, _scales_to_torch(batch.scales)

    patience = getattr(cfg, "early_stop_patience", None)
    best_miou, best_state, since_best = -1.0, None, 0
    for epoch in range(cfg.epochs):
        model.train()
        tot, n = 0.0, 0
        for batch in train_loader:
            x, y, scales = to_torch(batch)
            logits = model(x, scales)
            y = (y - cfg.label_offset).reshape(-1)
            loss = F.cross_entropy(
                logits.reshape(-1, cfg.num_classes), y, weight=cw,
                ignore_index=cfg.ignore_index,
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
            tot, n = tot + float(loss), n + 1
        sched.step()
        if patience is None:
            log.info("torch epoch %d: loss=%.4f", epoch, tot / max(n, 1))
            continue
        # plateau tracking (same rule as Trainer._train_loop): per-epoch
        # val mIoU, keep the best state, stop after `patience` flat epochs
        from crfconv_tpu.train.metrics import RunningScore

        model.eval()
        score = RunningScore(cfg.num_classes, cfg.ignore_index)
        with torch.no_grad():
            for batch in val_loader:
                x, y, scales = to_torch(batch)
                pred = model(x, scales).argmax(-1).reshape(-1).numpy()
                score.update(
                    (y - cfg.label_offset).reshape(-1).numpy(), pred
                )
        miou = score.get_scores()[0]["Mean IoU"]
        log.info(
            "torch epoch %d: loss=%.4f val mIoU=%.2f%%",
            epoch, tot / max(n, 1), miou * 100,
        )
        if miou >= best_miou:
            best_miou, since_best = miou, 0
            best_state = {
                k: v.detach().clone() for k, v in model.state_dict().items()
            }
        else:
            since_best += 1
            if since_best >= patience:
                log.info("torch early stop at epoch %d", epoch)
                break
    if best_state is not None:
        model.load_state_dict(best_state)

    # labeled vote test, exact reference semantics
    model.eval()
    ds = dataset.test_set
    test_probs = [
        np.zeros((c.shape[0], cfg.num_classes), np.float32)
        for c in ds.input_points
    ]

    def vote_epoch():
        with torch.no_grad():
            for batch in val_loader:
                x, _, scales = to_torch(batch)
                probs = torch.softmax(model(x, scales), dim=-1)
                probs = probs.reshape(
                    x.shape[0], -1, cfg.num_classes
                ).numpy()
                p_idx = np.asarray(batch.point_idx)
                c_idx = np.asarray(batch.cloud_idx).reshape(-1)
                for b in range(probs.shape[0]):
                    c = int(c_idx[b])
                    test_probs[c][p_idx[b]] = (
                        cfg.test_smooth * test_probs[c][p_idx[b]]
                        + (1 - cfg.test_smooth) * probs[b]
                    )

    return labeled_vote_eval(ds, vote_epoch, test_probs, num_votes)


def make_synthetic_raw(root: str, n_rooms: int = 2, n_pts: int = 500):
    """Tiny synthetic S3DIS raw corpus (same layout the dataset's
    process() consumes) for the --dry-run harness check."""
    rng = np.random.default_rng(0)
    raw = os.path.join(root, "raw")
    data_dir = os.path.join(raw, "Stanford3dDataset_v1.2_Aligned_Version")
    for area in (1, 5):
        rels = []
        for r in range(n_rooms):
            rel = f"Area_{area}/office_{r}/Annotations"
            anno = os.path.join(data_dir, rel)
            os.makedirs(anno, exist_ok=True)
            for cls in ("wall_1", "floor_1", "chair_1"):
                pts = np.column_stack([
                    rng.random((n_pts, 3)) * 3,
                    rng.integers(0, 255, (n_pts, 3)),
                ])
                np.savetxt(os.path.join(anno, cls + ".txt"), pts, fmt="%.4f")
            rels.append(rel)
        with open(os.path.join(raw, f"Area_{area}_anno.txt"), "w") as f:
            f.write("\n".join(rels) + "\n")


def run_parity(
    root: str,
    epochs: Optional[int] = None,
    num_votes: int = 100,
    seed: int = 0,
    dry_run: bool = False,
    out: Optional[str] = None,
    corpus: Optional[str] = None,
    rooms_per_area: int = 8,
    pts_per_room: int = 80_000,
    patience: Optional[int] = None,
    scale_kw: Optional[dict] = None,
) -> dict:
    """Train + vote-test both sides on S3DIS Area-5; return the report.

    ``corpus='rooms'`` runs the AT-SCALE harness on the structured
    synthetic corpus (parity/synthetic.py): ≥1M raw points of real room
    geometry with the 13-class S3DIS nomenclature, both arms trained to
    early-stopped plateau (``patience``) with their best-val state
    restored before the vote test — the committed ``parity_report.json``
    evidence for the ±0.3 mIoU charter claim when real S3DIS data is not
    mountable (VERDICT r4 next #5).  ``scale_kw`` overrides cfg fields
    (sample_num, batch_size, train_samples_per_epoch, ...).
    """
    from crfconv_tpu.data import datasets as D
    from crfconv_tpu.train.config import S3DISConfig
    from crfconv_tpu.train.trainer import Trainer

    if dry_run:
        if corpus == "rooms":
            from crfconv_tpu.parity.synthetic import make_synthetic_rooms

            make_synthetic_rooms(
                root, rooms_per_area=2, pts_per_room=2000, seed=seed
            )
        else:
            make_synthetic_raw(root)
        cfg = S3DISConfig(
            root=root, mode="train", use_crf=True, steps=1, grid_size=0.2,
            sample_num=128, batch_size=2, epochs=epochs or 1,
            train_samples_per_epoch=4, val_samples_per_epoch=2,
            early_stop_patience=patience,
            checkpoint_dir=os.path.join(root, "ckpt"),
        )
        num_votes = min(num_votes, 2)
    elif corpus == "rooms":
        from crfconv_tpu.parity.synthetic import make_synthetic_rooms

        if not os.path.isdir(os.path.join(root, "raw")):
            n = make_synthetic_rooms(
                root, rooms_per_area=rooms_per_area,
                pts_per_room=pts_per_room, seed=seed,
            )
            log.info("generated synthetic room corpus: %d raw points", n)
        cfg = S3DISConfig(
            root=root, mode="train",
            epochs=epochs or 60,
            early_stop_patience=5 if patience is None else patience,
            checkpoint_dir=os.path.join(root, "ckpt"),
            **(scale_kw or {}),
        )
    else:
        cfg = S3DISConfig(root=root, mode="train")
        if epochs is not None:
            cfg = dataclasses.replace(cfg, epochs=epochs)
        if patience is not None:
            cfg = dataclasses.replace(cfg, early_stop_patience=patience)

    def build_dataset():
        return D.S3DISRoomDataset(
            cfg.root, test_area=cfg.test_area, grid_size=cfg.grid_size,
            num_points=cfg.sample_num,
            train_sample_per_epoch=cfg.train_samples_per_epoch,
            test_sample_per_epoch=cfg.val_samples_per_epoch,
        )

    # Arm selection: 'both' (default) runs sequentially; 'jax'/'torch'
    # run one side and write its result to <root>/parity_<arm>.json so
    # the two arms can run in separate processes (the torch-CPU arm is
    # hours at scale; the JAX arm shares the TPU with other work), with
    # a final 'combine' pass assembling the report.
    arm = os.environ.get("CRFCONV_PARITY_ARM", "both")

    def _arm_path(name):
        return os.path.join(root, f"parity_{name}.json")

    jax_res = torch_res = None
    if arm in ("both", "jax"):
        # JAX side (fresh dataset: sampler state starts identically)
        log.info("parity: training the crfconv_tpu flagship ...")
        trainer = Trainer(cfg, dataset=build_dataset(), seed=seed)
        trainer.train()
        if cfg.early_stop_patience is not None:
            # plateau protocol: vote-test the best-val state (the torch
            # arm restores its best state_dict symmetrically)
            best = trainer.ckpt.best_path()
            if best is not None:
                trainer.load(best)
        jax_res = trainer.test_labeled(num_votes)
        with open(_arm_path("jax"), "w") as f:
            json.dump(jax_res, f)
    if arm in ("both", "torch"):
        log.info("parity: training the torch reference oracle ...")
        torch_res = run_torch_reference(
            cfg, build_dataset(), seed=seed, num_votes=num_votes
        )
        with open(_arm_path("torch"), "w") as f:
            json.dump(torch_res, f)
    if jax_res is None:
        if not os.path.exists(_arm_path("jax")):
            log.info("parity: torch arm done; jax arm pending")
            return {"torch": torch_res, "pending": "jax"}
        with open(_arm_path("jax")) as f:
            jax_res = json.load(f)
    if torch_res is None:
        if not os.path.exists(_arm_path("torch")):
            log.info("parity: jax arm done; torch arm pending")
            return {"jax": jax_res, "pending": "torch"}
        with open(_arm_path("torch")) as f:
            torch_res = json.load(f)

    jm = jax_res.get("full_mIoU", float("nan"))
    tm = torch_res.get("full_mIoU", float("nan"))
    delta = jm - tm
    report = {
        "jax_full_mIoU": jm,
        "torch_full_mIoU": tm,
        "delta": delta,
        "tolerance": MIOU_TOLERANCE,
        "within_tolerance": bool(abs(delta) <= MIOU_TOLERANCE),
        "jax": jax_res,
        "torch": torch_res,
        "config": {
            "epochs": cfg.epochs, "sample_num": cfg.sample_num,
            "batch_size": cfg.batch_size, "grid_size": cfg.grid_size,
            "num_votes": num_votes, "dry_run": dry_run,
            "corpus": corpus,
            "early_stop_patience": cfg.early_stop_patience,
            "neighbor_regime": cfg.neighbor_regime,
            **(
                {
                    "rooms_per_area": rooms_per_area,
                    "pts_per_room": pts_per_room,
                }
                if corpus == "rooms" else {}
            ),
        },
    }
    print(json.dumps(
        {k: report[k] for k in (
            "jax_full_mIoU", "torch_full_mIoU", "delta",
            "within_tolerance",
        )}
    ))
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
    return report
