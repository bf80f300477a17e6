"""Data layer tests: PLY I/O, transforms, possibility sampler, all six
dataset pipelines end-to-end on synthetic raw data, and the prefetching
multiscale loader."""

import os
import pickle

import numpy as np
import pytest

from crfconv_tpu.data.ply import read_ply, write_ply
from crfconv_tpu.data.sampler import PossibilitySampler
from crfconv_tpu.data import transforms as T
from crfconv_tpu.data.loader import MultiscaleLoader

RNG = np.random.default_rng(123)


class TestPly:
    def test_roundtrip(self, tmp_path):
        f = str(tmp_path / "cloud.ply")
        xyz = RNG.random((100, 3)).astype(np.float32)
        rgb = (RNG.random((100, 3)) * 255).astype(np.uint8)
        labels = RNG.integers(0, 13, 100).astype(np.int32)
        write_ply(f, [xyz, rgb, labels], ["x", "y", "z", "r", "g", "b", "class"])
        data = read_ply(f)
        np.testing.assert_allclose(
            np.stack([data["x"], data["y"], data["z"]], 1), xyz
        )
        np.testing.assert_array_equal(data["class"], labels)
        assert data["r"].dtype == np.uint8

    def test_mesh_roundtrip(self, tmp_path):
        """Faces element round-trip (reference utils/ply_utils.py:260-328)."""
        f = str(tmp_path / "mesh.ply")
        xyz = RNG.random((20, 3)).astype(np.float32)
        faces = RNG.integers(0, 20, (30, 3)).astype(np.int32)
        write_ply(f, [xyz], ["x", "y", "z"], triangular_faces=faces)
        verts, rfaces = read_ply(f, triangular_mesh=True)
        np.testing.assert_allclose(
            np.stack([verts["x"], verts["y"], verts["z"]], 1), xyz
        )
        np.testing.assert_array_equal(rfaces, faces)

    def test_list_property_ragged(self, tmp_path):
        """Generic list-property read (ascii, ragged rows)."""
        from crfconv_tpu.data.ply import read_ply_elements

        f = str(tmp_path / "ragged.ply")
        with open(f, "w") as fh:
            fh.write(
                "ply\nformat ascii 1.0\n"
                "element vertex 2\nproperty float x\n"
                "element face 2\nproperty list uchar int vertex_indices\n"
                "end_header\n"
                "1.5\n2.5\n"
                "3 0 1 2\n4 3 4 5 6\n"
            )
        els = read_ply_elements(f)
        np.testing.assert_allclose(els["vertex"]["x"], [1.5, 2.5])
        rows = els["face"]["vertex_indices"]
        assert rows.dtype == object
        np.testing.assert_array_equal(rows[0], [0, 1, 2])
        np.testing.assert_array_equal(rows[1], [3, 4, 5, 6])


class TestTransforms:
    def test_rotate_preserves_distances(self):
        pos = RNG.random((50, 3)).astype(np.float32)
        s = T.RandomRotate(180, axis=2)({"pos": pos}, RNG)
        d0 = np.linalg.norm(pos[0] - pos[1])
        d1 = np.linalg.norm(s["pos"][0] - s["pos"][1])
        assert abs(d0 - d1) < 1e-5
        # z unchanged for z-axis rotation
        np.testing.assert_allclose(s["pos"][:, 2], pos[:, 2], atol=1e-6)

    def test_full_stack(self):
        tr = T.default_train_transform()
        s = tr(
            {"pos": RNG.random((64, 3)).astype(np.float32),
             "rgb": RNG.random((64, 3)).astype(np.float32),
             "y": np.zeros(64, np.int64)},
            RNG,
        )
        assert s["x"].shape == (64, 6)

    def test_drop_feature(self):
        rng = np.random.default_rng(0)
        dropped = 0
        for _ in range(200):
            s = T.DropFeature(0.2, "rgb")(
                {"rgb": np.ones((4, 3), np.float32)}, rng
            )
            dropped += int(s["rgb"].sum() == 0)
        assert 20 < dropped < 80  # ~40/200


class TestSampler:
    def test_coverage_and_state(self):
        clouds = [RNG.random((500, 3)).astype(np.float32) * 5 for _ in range(3)]
        labels = [RNG.integers(0, 5, 500).astype(np.int64) for _ in range(3)]
        s = PossibilitySampler(clouds, 128, labels=labels, seed=0)
        seen = [np.zeros(500, bool) for _ in range(3)]
        m0 = min(s.min_possibility)
        for _ in range(40):
            out = s.sample()
            assert out["pos"].shape == (128, 3)
            seen[int(out["cloud_idx"])][out["point_idx"]] = True
        assert min(s.min_possibility) > m0
        # possibility sampling spreads draws across all clouds
        assert all(sn.mean() > 0.5 for sn in seen)

    def test_short_cloud_padding(self):
        s = PossibilitySampler([RNG.random((50, 3)).astype(np.float32)], 128)
        out = s.sample()
        assert out["pos"].shape == (128, 3)
        assert out["point_idx"].max() < 50


# ---------------------------------------------------------------------------
# synthetic raw data fixtures
# ---------------------------------------------------------------------------

def _make_s3dis_raw(root, n_rooms=2, n_pts=400):
    raw = os.path.join(root, "raw")
    data_dir = os.path.join(raw, "Stanford3dDataset_v1.2_Aligned_Version")
    for area in (1, 5):
        rels = []
        for r in range(n_rooms):
            rel = f"Area_{area}/office_{r}/Annotations"
            anno = os.path.join(data_dir, rel)
            os.makedirs(anno, exist_ok=True)
            for cls in ("wall_1", "floor_1"):
                pts = np.column_stack([
                    RNG.random((n_pts, 3)) * 3,
                    RNG.integers(0, 255, (n_pts, 3)),
                ])
                np.savetxt(os.path.join(anno, cls + ".txt"), pts, fmt="%.4f")
            rels.append(rel)
        with open(os.path.join(raw, f"Area_{area}_anno.txt"), "w") as f:
            f.write("\n".join(rels) + "\n")


class TestS3DIS:
    def test_room_pipeline(self, tmp_path):
        from crfconv_tpu.data.datasets import S3DISRoom

        root = str(tmp_path)
        _make_s3dis_raw(root)
        ds = S3DISRoom(root, test_area=5, grid_size=0.2, num_points=256,
                       sample_per_epoch=4, train=True)
        assert len(ds.input_points) == 2  # Area_1 rooms only
        s = ds.get_sample(np.random.default_rng(0))
        assert s["pos"].shape == (256, 3)
        assert s["rgb"].shape == (256, 3)
        ds_test = S3DISRoom(root, test_area=5, grid_size=0.2, num_points=256,
                            sample_per_epoch=2, train=False)
        assert len(ds_test.val_proj) == 2
        # projection indices map the full cloud into the sub cloud
        assert ds_test.val_proj[0].max() < ds_test.input_points[0].shape[0]

    def test_block_pipeline(self, tmp_path):
        from crfconv_tpu.data.datasets import S3DISBlockDataset

        root = str(tmp_path)
        _make_s3dis_raw(root)
        ds = S3DISBlockDataset(root, train=True, test_area=5, num_points=128)
        assert len(ds.filelist) > 0
        s = ds.get_sample(np.random.default_rng(0))
        assert s["pos"].shape == (128, 3)
        assert s["x"].shape == (128, 6)


class TestSemantic3D:
    def test_pipeline_and_splits(self, tmp_path):
        from crfconv_tpu.data.datasets import Semantic3D

        root = str(tmp_path)
        txt = os.path.join(root, "raw", "txt")
        os.makedirs(txt)
        for i, name in enumerate(["cloudA", "cloudB"]):
            pc = np.column_stack([
                RNG.random((500, 3)) * 8,       # xyz
                RNG.random((500, 1)),           # intensity
                RNG.integers(0, 255, (500, 3)),  # rgb
            ])
            np.savetxt(os.path.join(txt, name + ".txt"), pc, fmt="%.4f")
            np.savetxt(
                os.path.join(txt, name + ".labels"),
                RNG.integers(1, 9, 500),
                fmt="%d",
            )
        # one unlabeled test cloud
        pc = np.column_stack([
            RNG.random((300, 3)) * 8, RNG.random((300, 1)),
            RNG.integers(0, 255, (300, 3)),
        ])
        np.savetxt(os.path.join(txt, "cloudT.txt"), pc, fmt="%.4f")

        tr = Semantic3D(root, "train", grid_size=0.4, num_points=128,
                        sample_per_epoch=2)
        # ALL_SPLITS[1] == 1 == VAL_SPLIT → cloudB is val, cloudA train
        assert tr.cloud_names == ["cloudA"]
        va = Semantic3D(root, "val", grid_size=0.4, num_points=128,
                        sample_per_epoch=2)
        assert va.cloud_names == ["cloudB"]
        te = Semantic3D(root, "test", grid_size=0.4, num_points=128,
                        sample_per_epoch=2)
        assert te.cloud_names == ["cloudT"]
        s = tr.get_sample(np.random.default_rng(0))
        assert s["pos"].shape == (128, 3)
        assert 0 <= s["y"].min() and s["y"].max() <= 8
        st = te.get_sample(np.random.default_rng(0))
        assert st["y"].sum() == 0


class TestSemantic3DBlocks:
    def test_block_pipeline(self, tmp_path):
        """Block regime (reference semantic3d_dataset.py:52-158): 5 m
        blocks / stride 3 / padding 0.5, bottom-center-normalized xyz."""
        from crfconv_tpu.data.datasets import Semantic3DBlockDataset

        root = str(tmp_path)
        txt = os.path.join(root, "raw", "txt")
        os.makedirs(txt)
        for name in ("cloudA", "cloudB"):
            pc = np.column_stack([
                RNG.random((4000, 3)) * 8,       # xyz (8 m extent)
                RNG.random((4000, 1)),           # intensity
                RNG.integers(0, 255, (4000, 3)),  # rgb
            ])
            np.savetxt(os.path.join(txt, name + ".txt"), pc, fmt="%.4f")
            np.savetxt(
                os.path.join(txt, name + ".labels"),
                RNG.integers(1, 9, 4000),
                fmt="%d",
            )
        tr = Semantic3DBlockDataset(root, "train", num_points=256)
        va = Semantic3DBlockDataset(root, "val", num_points=256)
        # split table: cloudB (index 1) is val, cloudA train
        assert len(tr.filelist) > 0 and len(va.filelist) > 0
        assert all("cloudA" in f for f in tr.filelist)
        assert all("cloudB" in f for f in va.filelist)
        s = tr.get_sample(np.random.default_rng(0))
        assert s["pos"].shape == (256, 3)
        assert s["x"].shape == (256, 6)   # normalized xyz + rgb
        # features: xy centered on the block, z from the block bottom
        assert abs(float(s["x"][:, 0].mean())) < 2.6
        assert float(s["x"][:, 2].min()) >= -1e-5
        assert 0.0 <= s["x"][:, 3:].min() and s["x"][:, 3:].max() <= 1.0
        assert 1 <= s["y"].min() and s["y"].max() <= 8


class TestScanNet:
    def test_pipeline(self, tmp_path):
        from crfconv_tpu.data.datasets import ScanNetDataset

        root = str(tmp_path)
        raw = os.path.join(root, "raw")
        os.makedirs(raw)
        rooms = [np.asarray(RNG.random((3000, 3)) * 3, np.float32) for _ in range(2)]
        labels = [RNG.integers(0, 21, 3000) for _ in range(2)]
        for name in ("scannet_train.pickle", "scannet_test.pickle"):
            with open(os.path.join(raw, name), "wb") as f:
                pickle.dump(rooms, f)
                pickle.dump(labels, f)
        ds = ScanNetDataset(root, train=True, num_points=128)
        assert len(ds.filelist) > 0
        s = ds.get_sample(np.random.default_rng(0))
        assert s["pos"].shape == (128, 3)
        assert s["y"].min() >= -1 and s["y"].max() <= 19  # shifted by -1


class TestNPM3D:
    def test_pipeline(self, tmp_path):
        from crfconv_tpu.data.datasets import NPM3DDataset

        root = str(tmp_path)
        raw = os.path.join(root, "raw")
        os.makedirs(raw)
        xyz = (RNG.random((800, 3)) * 12).astype(np.float32)
        refl = (RNG.random(800) * 255).astype(np.float32)
        cls = RNG.integers(0, 10, 800).astype(np.int32)
        write_ply(
            os.path.join(raw, "lille1.ply"),
            [xyz, refl, cls],
            ["x", "y", "z", "reflectance", "class"],
        )
        with open(os.path.join(raw, "trainval.txt"), "w") as f:
            f.write("lille1\n")
        ds = NPM3DDataset(root, train=True, num_points=128)
        assert len(ds.filelist) > 0
        s = ds.get_sample(np.random.default_rng(0))
        assert s["x"].shape == (128, 4)  # centered xyz + intensity
        assert s["y"].min() >= -1


class TestSemanticKITTI:
    def test_pipeline(self, tmp_path):
        from crfconv_tpu.data.datasets import SemanticKITTIDataset

        root = str(tmp_path)
        seq = os.path.join(root, "raw", "sequences", "00")
        os.makedirs(os.path.join(seq, "velodyne"))
        os.makedirs(os.path.join(seq, "labels"))
        scan = RNG.random((1000, 4)).astype(np.float32)
        scan.tofile(os.path.join(seq, "velodyne", "000000.bin"))
        sem = RNG.integers(0, 20, 1000).astype(np.uint32)
        inst = RNG.integers(0, 3, 1000).astype(np.uint32)
        (sem | (inst << 16)).astype(np.uint32).tofile(
            os.path.join(seq, "labels", "000000.label")
        )
        ds = SemanticKITTIDataset(root, sequences="train", num_points=256)
        assert len(ds.filelist) == 1
        s = ds.get_sample(np.random.default_rng(0))
        assert s["pos"].shape == (256, 3)
        assert s["x"].shape == (256, 4)
        # without the yaml the DEFAULT learning_map applies: raw labels
        # always land in [0, 19] (0 = ignore), never pass through raw
        assert ds.num_classes == 19
        assert 0 <= s["y"].min() and s["y"].max() <= 19

    def test_default_learning_map_semantics(self):
        from crfconv_tpu.data.datasets.semantickitti import (
            DEFAULT_LEARNING_MAP,
            _build_lut,
        )

        lut = _build_lut(DEFAULT_LEARNING_MAP)
        # spot-check the official mapping: car=1, road=9, moving-car
        # folds to car, lane-marking folds to road, unlabeled/outlier=0
        assert lut[10] == 1 and lut[252] == 1
        assert lut[40] == 9 and lut[60] == 9
        assert lut[0] == 0 and lut[1] == 0 and lut[99] == 0
        assert lut.max() == 19
        # every raw id NOT in the map is ignore (0)
        assert lut[2] == 0 and lut[100] == 0

    def test_out_of_range_raw_label_raises(self, tmp_path):
        from crfconv_tpu.data.datasets import SemanticKITTIDataset

        root = str(tmp_path)
        seq = os.path.join(root, "raw", "sequences", "00")
        os.makedirs(os.path.join(seq, "velodyne"))
        os.makedirs(os.path.join(seq, "labels"))
        scan = RNG.random((100, 4)).astype(np.float32)
        scan.tofile(os.path.join(seq, "velodyne", "000000.bin"))
        sem = np.full(100, 50000, np.uint32)  # beyond the LUT range
        sem.tofile(os.path.join(seq, "labels", "000000.label"))
        ds = SemanticKITTIDataset(root, sequences="train", num_points=64)
        with pytest.raises(ValueError, match="learning_map range"):
            ds.get_sample(np.random.default_rng(0))

    def test_streaming_eval(self, tmp_path):
        """Per-sequence streaming eval: full frames, per-seq + overall
        confusion, perfect predictions -> mIoU 1 on labeled classes."""
        from crfconv_tpu.data.datasets import SemanticKITTIDataset
        from crfconv_tpu.train.kitti_eval import streaming_eval

        root = str(tmp_path)
        rng = np.random.default_rng(3)
        for seq_id, nf in [("00", 2), ("01", 3)]:
            seq = os.path.join(root, "raw", "sequences", seq_id)
            os.makedirs(os.path.join(seq, "velodyne"))
            os.makedirs(os.path.join(seq, "labels"))
            for f_i in range(nf):
                n = 200 + 10 * f_i
                scan = rng.random((n, 4)).astype(np.float32)
                scan.tofile(
                    os.path.join(seq, "velodyne", f"{f_i:06d}.bin")
                )
                sem = rng.choice(
                    [0, 10, 40, 48, 50], size=n
                ).astype(np.uint32)
                sem.tofile(os.path.join(seq, "labels", f"{f_i:06d}.label"))
        ds = SemanticKITTIDataset(root, sequences="train", num_points=64)
        assert ds.sequences == ["00", "01"]
        assert len(ds.frames_of("01")) == 3
        # frames come back in temporal order and full-size
        fr = ds.get_frame(ds.frames_of("00")[1])
        assert fr["pos"].shape[0] == 210 and fr["sequence"] == "00"

        out = streaming_eval(ds, lambda frame: frame["y"] - 1)
        assert set(out["per_sequence"]) == {"00", "01"}
        assert out["overall"]["Mean IoU"] == pytest.approx(1.0)
        assert out["per_sequence"]["01"]["num_frames"] == 3
        # a constant-class predictor scores < 1
        out2 = streaming_eval(
            ds, lambda frame: np.zeros(frame["pos"].shape[0], np.int64)
        )
        assert out2["overall"]["Mean IoU"] < 1.0


class TestShapeNet:
    def test_pipeline(self, tmp_path):
        from crfconv_tpu.data.datasets import ShapeNetNormalDataset

        root = str(tmp_path)
        raw = os.path.join(root, "raw")
        split_dir = os.path.join(raw, "train_test_split")
        os.makedirs(split_dir)
        cats = {"Airplane": "02691156", "Chair": "03001627"}
        with open(os.path.join(raw, "synsetoffset2category.txt"), "w") as f:
            for k, v in cats.items():
                f.write(f"{k}\t{v}\n")
        import json

        entries = {"train": [], "val": [], "test": []}
        for synset, base in [("02691156", 0), ("03001627", 12)]:
            d = os.path.join(raw, synset)
            os.makedirs(d)
            for i, split in enumerate(["train", "val", "test"]):
                sid = f"shape{synset}_{i}"
                n = 300 + 10 * i
                arr = np.column_stack([
                    RNG.random((n, 3)), RNG.random((n, 3)),
                    RNG.integers(base, base + 4, n),
                ])
                np.savetxt(os.path.join(d, sid + ".txt"), arr, fmt="%.4f")
                entries[split].append(f"shape_data/{synset}/{sid}")
        for split, ent in entries.items():
            with open(
                os.path.join(split_dir, f"shuffled_{split}_file_list.json"),
                "w",
            ) as f:
                json.dump(ent, f)

        ds = ShapeNetNormalDataset(root, train=True, num_points=256)
        assert len(ds) == 4  # train + val collated
        s = ds.get_sample(np.random.default_rng(0))
        assert s["x"].shape == (256, 6)
        assert 0 <= s["category"] <= 1
        ds_test = ShapeNetNormalDataset(root, train=False, num_points=256)
        assert len(ds_test) == 2


class TestLoader:
    def test_end_to_end_batches(self, tmp_path):
        from crfconv_tpu.data.datasets import S3DISRoom

        root = str(tmp_path)
        _make_s3dis_raw(root)
        ds = S3DISRoom(root, test_area=5, grid_size=0.2, num_points=256,
                       sample_per_epoch=8, train=True)
        loader = MultiscaleLoader(
            ds, batch_size=2,
            transform=T.default_train_transform(),
            device_put=False, prefetch=2, seed=0,
        )
        batches = list(loader)
        assert len(batches) == 4
        b = batches[0]
        assert b.x.shape == (2, 256, 6)
        assert b.y.shape == (2, 256)
        assert len(b.scales) == 5
        assert b.scales[0].neighbor_idx.shape == (2, 256, 16)
        assert b.scales[1].pos.shape == (2, 64, 3)
        assert b.scales[0].up_idx.shape == (2, 256, 1)

    def test_worker_error_propagates(self):
        class Broken:
            def __len__(self):
                return 4

            def get_sample(self, rng, idx=None):
                raise RuntimeError("boom")

        loader = MultiscaleLoader(Broken(), batch_size=2, device_put=False)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)
