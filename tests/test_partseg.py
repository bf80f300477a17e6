"""ShapeNet part-segmentation Trainer: train a step and run the
part-IoU evaluation protocol end-to-end on a synthetic corpus."""

import json
import os

import numpy as np
import pytest

from crfconv_tpu.train.config import ShapeNetConfig
from crfconv_tpu.train.trainer import Trainer

RNG = np.random.default_rng(7)


def _make_shapenet_raw(root):
    raw = os.path.join(root, "raw")
    split_dir = os.path.join(raw, "train_test_split")
    os.makedirs(split_dir)
    cats = {"Airplane": "02691156", "Chair": "03001627"}
    with open(os.path.join(raw, "synsetoffset2category.txt"), "w") as f:
        for k, v in cats.items():
            f.write(f"{k}\t{v}\n")
    entries = {"train": [], "val": [], "test": []}
    for synset, base in [("02691156", 0), ("03001627", 12)]:
        d = os.path.join(raw, synset)
        os.makedirs(d)
        for i, split in enumerate(["train", "val", "test"]):
            sid = f"shape_{synset}_{i}"
            n = 200
            arr = np.column_stack([
                RNG.random((n, 3)), RNG.random((n, 3)),
                RNG.integers(base, base + 4, n),
            ])
            np.savetxt(os.path.join(d, sid + ".txt"), arr, fmt="%.4f")
            entries[split].append(f"shape_data/{synset}/{sid}")
    for split, ent in entries.items():
        with open(
            os.path.join(split_dir, f"shuffled_{split}_file_list.json"), "w"
        ) as f:
            json.dump(ent, f)


def test_shapenet_trainer_and_part_iou(tmp_path):
    root = str(tmp_path / "shapenet")
    os.makedirs(root)
    _make_shapenet_raw(root)
    cfg = ShapeNetConfig(
        root=root,
        mode="train",
        steps=1,
        sample_num=128,
        batch_size=2,
        epochs=1,
        train_samples_per_epoch=4,
        val_samples_per_epoch=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(cfg, seed=0)
    tr = trainer.train_one_epoch(0)
    assert np.isfinite(tr["loss"])
    res = trainer.eval_partseg()
    assert 0.0 <= res["pIoU"] <= 1.0
    assert 0.0 <= res["mpIoU"] <= 1.0
    assert set(res["class_pIoU"]) == {
        "Airplane", "Bag", "Cap", "Car", "Chair", "Earphone", "Guitar",
        "Knife", "Lamp", "Laptop", "Motorbike", "Mug", "Pistol", "Rocket",
        "Skateboard", "Table",
    }