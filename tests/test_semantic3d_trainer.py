"""Semantic3D trainer flow: label shift (1..8 → 0..7), class-weighted CE,
vote test with the Semantic3D attribute names (test_proj/val_files)."""

import os

import numpy as np
import pytest

from crfconv_tpu.train.config import Semantic3DConfig
from crfconv_tpu.train.trainer import Trainer

RNG = np.random.default_rng(21)


def _make_semantic3d_raw(root, n_pts=800):
    txt = os.path.join(root, "raw", "txt")
    os.makedirs(txt)
    for name in ["cloudA", "cloudB"]:
        pc = np.column_stack([
            RNG.random((n_pts, 3)) * 6,
            RNG.random((n_pts, 1)),
            RNG.integers(0, 255, (n_pts, 3)),
        ])
        np.savetxt(os.path.join(txt, name + ".txt"), pc, fmt="%.4f")
        np.savetxt(
            os.path.join(txt, name + ".labels"),
            RNG.integers(1, 9, n_pts), fmt="%d",
        )


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sem3d"))
    _make_semantic3d_raw(root)
    cfg = Semantic3DConfig(
        root=root,
        mode="train",
        use_crf=True,
        steps=1,
        grid_size=0.3,
        sample_num=256,
        batch_size=2,
        epochs=1,
        train_samples_per_epoch=4,
        val_samples_per_epoch=2,
        checkpoint_dir=str(tmp_path_factory.mktemp("ck")),
    )
    return Trainer(cfg, seed=0)


def test_train_epoch_with_label_shift(trainer):
    tr = trainer.train_one_epoch(0)
    assert np.isfinite(tr["loss"])
    # confusion matrix only counts shifted labels in [0, 8)
    assert trainer.metrics.confusion_matrix.shape == (8, 8)
    assert trainer.metrics.confusion_matrix.sum() > 0


def test_unlabeled_vote_test_writes_predictions(trainer, tmp_path):
    out = trainer.test(num_votes=1, saving_path=str(tmp_path / "preds"))
    files = sorted(os.listdir(out))
    # one val cloud (cloudB per the split table): PLY + ascii submission
    ply_files = [f for f in files if not f.endswith(".labels")]
    label_files = [f for f in files if f.endswith(".labels")]
    assert len(ply_files) == 1 and len(label_files) == 1
    from crfconv_tpu.data.ply import read_ply

    p = read_ply(os.path.join(out, ply_files[0]))
    # predictions are written in dataset label space (1..8)
    assert 1 <= p["pred"].min() and p["pred"].max() <= 8
    # projected to the FULL (0.01-normalized) cloud, not the sub-cloud
    assert p["pred"].shape[0] == trainer.val_set.test_labels[0].shape[0]
    # benchmark-server ascii submission (reference trainval.py:206-208):
    # one int label per full-cloud point, same values as the PLY
    sub = np.loadtxt(os.path.join(out, label_files[0]), dtype=np.int64)
    assert sub.shape[0] == p["pred"].shape[0]
    np.testing.assert_array_equal(sub, p["pred"].astype(np.int64))