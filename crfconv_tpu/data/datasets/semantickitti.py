"""SemanticKITTI sequential LiDAR dataset.

Reference: datasets/semantickitti_dataset.py:11-122.  Raw layout:
``raw/sequences/<seq>/velodyne/*.bin`` float32 (x, y, z, remission) scans
with ``labels/*.label`` uint32 companions (semantic label in the low 16
bits, instance id in the high 16 — :77-83), and
``raw/semantic-kitti.yaml`` providing the 25→19 ``learning_map`` and the
train/valid/test sequence split.  Frames are read directly from the raw
files (no conversion pass needed — the .bin format is already dense).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from crfconv_tpu.data.datasets.base import fixed_size_choice

# Official SemanticKITTI split (from the dataset's semantic-kitti.yaml);
# used as the fallback when the yaml is not present alongside the data.
DEFAULT_SPLIT = {
    "train": [0, 1, 2, 3, 4, 5, 6, 7, 9, 10],
    "valid": [8],
    "test": [11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21],
}


def load_config(yaml_path: str) -> Tuple[np.ndarray, Dict[str, List[int]]]:
    """learning_map LUT + split from semantic-kitti.yaml."""
    import yaml

    with open(yaml_path) as f:
        data = yaml.safe_load(f)
    remap = data["learning_map"]
    lut = np.zeros(max(remap.keys()) + 100, dtype=np.int32)
    lut[list(remap.keys())] = list(remap.values())
    return lut, data["split"]


class SemanticKITTIDataset:
    def __init__(
        self,
        root: str,
        sequences: str = "train",
        num_points: int = 65536,
        sample_per_epoch: int = -1,
    ):
        self.root = root
        self.raw_dir = os.path.join(root, "raw")
        self.num_points = num_points
        self.sample_per_epoch = sample_per_epoch

        yaml_path = os.path.join(self.raw_dir, "semantic-kitti.yaml")
        if os.path.exists(yaml_path):
            self.lut, self.split = load_config(yaml_path)
        else:
            self.lut, self.split = None, DEFAULT_SPLIT

        if sequences in ("train", "val", "valid", "test"):
            key = "valid" if sequences == "val" else sequences
            seq_ids = [f"{i:02d}" for i in self.split[key]]
        else:
            seq_ids = [sequences]

        self.filelist: List[str] = []
        for seq in seq_ids:
            self.filelist += sorted(
                glob.glob(
                    os.path.join(
                        self.raw_dir, "sequences", seq, "velodyne", "*.bin"
                    )
                )
            )

    @staticmethod
    def load_scan(path: str) -> Tuple[np.ndarray, np.ndarray]:
        scan = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
        return scan[:, :3], scan[:, 3]

    @staticmethod
    def load_labels(path: str) -> Tuple[np.ndarray, np.ndarray]:
        labels = np.fromfile(path, dtype=np.uint32).reshape(-1)
        sem = labels & 0xFFFF
        inst = labels >> 16
        return sem, inst

    def __len__(self):
        return (
            self.sample_per_epoch
            if self.sample_per_epoch > 0
            else len(self.filelist)
        )

    def get_sample(self, rng: np.random.Generator, idx: Optional[int] = None):
        if idx is None or self.sample_per_epoch > 0:
            idx = int(rng.integers(len(self.filelist)))
        path = self.filelist[idx]
        points, remission = self.load_scan(path)
        label_path = path.replace("velodyne", "labels").replace(
            ".bin", ".label"
        )
        if os.path.exists(label_path):
            sem, _ = self.load_labels(label_path)
            y = (self.lut[sem] if self.lut is not None else sem).astype(
                np.int64
            )
        else:
            y = np.zeros(points.shape[0], np.int64)
        sel = fixed_size_choice(points.shape[0], self.num_points, rng)
        return {
            "pos": points[sel],
            "x": np.concatenate(
                [points[sel], remission[sel, None]], axis=-1
            ).astype(np.float32),
            "y": y[sel],
            "point_idx": sel.astype(np.int64),
            "cloud_idx": np.int64(idx),
        }
