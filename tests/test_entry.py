"""Driver entry-point regression: entry() compiles and runs; the
multichip dryrun executes a full DP train step on the 8-device mesh."""

import pytest
import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 1024, 13)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
