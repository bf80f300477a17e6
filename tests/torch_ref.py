"""Back-compat shim: the torch oracle moved into the package
(crfconv_tpu/parity/oracle.py) so the parity runbook can train it on
real data; tests keep importing it from here."""

from crfconv_tpu.parity.oracle import *  # noqa: F401,F403
from crfconv_tpu.parity.oracle import (  # noqa: F401
    TorchMLP,
    TorchPointConv,
    TorchResNetBBlock,
    TorchCRFConv,
    TorchUpsampling,
    TorchPointConvResNet,
    gather_neighbors,
    load_from_flax,
)
