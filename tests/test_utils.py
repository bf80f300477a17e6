"""Utils tests: visualization assembly/export, profiling meters, CLI."""

import json
import os

import numpy as np
import pytest

from crfconv_tpu.utils.profiling import StepTimer
from crfconv_tpu.utils.visualization import (
    assemble_room,
    assemble_values,
    export_colored_ply,
    labels_to_colors,
    render_png,
)

RNG = np.random.default_rng(0)


class TestVisualization:
    def _blocks(self):
        # room of 100 points split into two overlapping blocks
        pos = RNG.random((100, 3)).astype(np.float32)
        labels = RNG.integers(0, 13, 100)
        b1 = {"pos": pos[:60], "indices": np.arange(60), "pred": labels[:60]}
        b2 = {"pos": pos[40:], "indices": np.arange(40, 100),
              "pred": labels[40:]}
        return pos, labels, [b1, b2]

    def test_assemble(self):
        pos, labels, blocks = self._blocks()
        out, filled = assemble_room(blocks)
        assert filled.all()
        np.testing.assert_allclose(out, pos)
        vals = assemble_values(blocks, "pred")
        np.testing.assert_array_equal(vals, labels)

    def test_colored_ply(self, tmp_path):
        pos, labels, _ = self._blocks()
        f = export_colored_ply(str(tmp_path / "room.ply"), pos, labels)
        from crfconv_tpu.data.ply import read_ply

        data = read_ply(f)
        assert data["r"].shape[0] == 100
        expect = labels_to_colors(labels)
        np.testing.assert_array_equal(data["r"], expect[:, 0])

    def test_render_png(self, tmp_path):
        pos, labels, _ = self._blocks()
        f = render_png(str(tmp_path / "room.png"), pos, labels)
        assert os.path.getsize(f) > 1000


class TestStepTimer:
    def test_throughput(self):
        t = StepTimer(warmup_steps=1)
        for _ in range(5):
            t.tick(points=100)
        s = t.summary()
        assert s["steps"] == 4
        assert s["points_per_sec"] > 0


class TestCLI:
    def test_cli_runs_tiny_train(self, tmp_path):
        from crfconv_tpu.train.__main__ import main
        from tests.test_data import _make_s3dis_raw

        root = str(tmp_path / "s3dis")
        _make_s3dis_raw(root)
        result = main([
            "--dataset", "S3DIS", "--root", root, "--mode", "train",
            "--epochs", "1", "--batch-size", "2",
            "--set", "sample_num=256",
            "--set", "grid_size=0.2",
            "--set", "train_samples_per_epoch=4",
            "--set", "val_samples_per_epoch=2",
            "--set", f"checkpoint_dir={tmp_path}/ckpt",
        ])
        assert 0.0 <= result <= 1.0

    def test_cli_rejects_unknown_field(self):
        from crfconv_tpu.train.__main__ import main

        with pytest.raises(SystemExit):
            main([
                "--dataset", "S3DIS", "--root", "/nonexistent",
                "--set", "bogus_field=1",
            ])


class TestHtmlViewer:
    def test_export_html_self_contained(self, tmp_path):
        from crfconv_tpu.utils.visualization import export_html

        rng = np.random.default_rng(0)
        pos = rng.random((500, 3)).astype(np.float32)
        labels = rng.integers(0, 13, 500)
        path = export_html(str(tmp_path / "cloud.html"), pos, labels=labels)
        html = open(path).read()
        # one self-contained file: data embedded, no external fetches
        assert "<script>" in html and "http" not in html.split("</title>")[1]
        assert html.count(",") > 3 * 500  # embedded coordinates
        assert "drawArrays" in html


class TestDeviceTime:
    """Both timing protocols, with and without the env pytree (the env
    path is what keeps model parameters out of MLIR constants — the r5
    lowering-catastrophe fix)."""

    def test_loop_and_chain_agree(self):
        import jax.numpy as jnp
        import numpy as np

        from crfconv_tpu.utils import device_time

        a = jnp.asarray(np.random.default_rng(0).random((256, 256), np.float32))

        def step(c):
            x, y = c
            return (x @ y, y)

        tl = device_time(step, (a, a), iters=8, mode="loop")
        tc = device_time(step, (a, a), iters=8, mode="chain")
        assert 0 < tl < 1 and 0 < tc < 1

    def test_env_operand(self):
        import jax.numpy as jnp
        import numpy as np

        from crfconv_tpu.utils import device_time

        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.random((128, 128), np.float32))
        w = jnp.asarray(rng.random((128, 128), np.float32))

        def step(c, env):
            return c @ env

        for mode in ("loop", "chain"):
            t = device_time(step, a, iters=8, mode=mode, env=w)
            assert 0 < t < 1
