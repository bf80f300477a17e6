"""Spatial-forward context state (leaf module, no dependencies).

When ``CTX`` is set, the windowed ops (``neighbors.gather_neighbors``,
``crf.crf_mean_field``, the fused-conv dispatcher) reroute to their
halo-exchange implementations in ``parallel.spatial_forward`` — this is
what lets an unmodified flax model run point-sharded inside ``shard_map``
(parallel/spatial_forward.py documents the mechanism).

The state is read at TRACE time only and is only ever set inside
``parallel.spatial_forward``'s shard_map body, so it cannot poison the
jit caches of ordinary forwards (the ADVICE-r2 mode-dispatch lesson):
every trace that sees a non-None CTX belongs to a closure constructed by
``make_spatial_forward``, and the module-level inner jits (scan CRF,
windowed gather) are always entered with the context suspended.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

# None, or a dict with keys:
#   axis:   mesh axis name (str)
#   ndev:   mesh size along that axis (int)
#   frames: {seen_point_axis_len: (sharded: bool, global_len: int)}
CTX: Optional[dict] = None


def current() -> Optional[dict]:
    return CTX


@contextmanager
def activate(ctx: dict):
    global CTX
    assert CTX is None, "spatial contexts do not nest"
    CTX = ctx
    try:
        yield
    finally:
        CTX = None


@contextmanager
def suspend():
    """Temporarily clear the context (used around inner computations that
    operate on already-localized extended blocks)."""
    global CTX
    saved, CTX = CTX, None
    try:
        yield
    finally:
        CTX = saved
