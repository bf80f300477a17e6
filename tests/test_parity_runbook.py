"""The S3DIS parity runbook harness, dry-run verified (VERDICT r2 #4):
the moment real S3DIS data is mounted, `python -m crfconv_tpu.parity
--root ...` is one checked command away from the ±0.3 mIoU claim."""

import numpy as np
import pytest


@pytest.mark.slow
def test_dry_run_end_to_end(tmp_path):
    from crfconv_tpu.parity import run_parity

    report = run_parity(
        str(tmp_path), dry_run=True, num_votes=2, seed=0,
        out=str(tmp_path / "report.json"),
    )
    # both sides trained and vote-tested; mIoUs are numbers in [0, 1]
    # (when voting converges within the tiny cap) or the documented
    # early-return {} — on the synthetic corpus with 2 votes it converges
    assert "jax" in report and "torch" in report
    for side in ("jax_full_mIoU", "torch_full_mIoU"):
        v = report[side]
        assert np.isnan(v) or 0.0 <= v <= 1.0
    assert (tmp_path / "report.json").exists()
    assert isinstance(report["within_tolerance"], bool)
