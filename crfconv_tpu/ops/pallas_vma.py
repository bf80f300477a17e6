"""shard_map-aware pallas_call wrapper (varying-manual-axes plumbing).

Under ``jax.shard_map(..., check_vma=True)`` (the default), a
``pl.pallas_call`` whose ``out_shape`` carries no ``vma`` raises at trace
time, and interpret mode additionally requires every operand to share
one vma set (its internal loop counters are unvarying, so mixed-vma
operands break ``dynamic_slice`` during jaxpr eval).  All our spatial
(point-sharded) paths run Pallas kernels inside shard_map — the chunked
CRF halo iteration, the sharded pyramid build, and the spatial fused
point conv — so every kernel in this package routes through
:func:`pallas_call` below, which at CALL time:

  * computes the union of the operands' vma sets,
  * re-tags every ``ShapeDtypeStruct`` in ``out_shape`` with it, and
  * ``pvary``'s the replicated operands up to it (folded weights, window
    starts and similar constants built inside the jitted wrapper are
    replicated until explicitly pvary'd).

Outside shard_map the union is empty and the wrapper is the identity.
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl


def _vma_of(a) -> frozenset:
    try:
        return getattr(jax.typeof(a), "vma", frozenset()) or frozenset()
    except TypeError:
        return frozenset()


def _pvary_to(a, vma: frozenset):
    missing = tuple(v for v in vma if v not in _vma_of(a))
    return jax.lax.pvary(a, missing) if missing else a


def pallas_call(kernel, **kw):
    """Drop-in for ``pl.pallas_call(kernel, **kw)`` returning a callable;
    vma handling is resolved from the actual operands at call time."""

    def call(*args):
        u = frozenset()
        for a in args:
            u |= _vma_of(a)
        out_shape = kw.get("out_shape")
        if u and out_shape is not None:
            out_shape = jax.tree.map(
                lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, vma=u),
                out_shape,
                is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
            )
            args = tuple(_pvary_to(a, u) for a in args)
            return pl.pallas_call(kernel, **{**kw, "out_shape": out_shape})(
                *args
            )
        return pl.pallas_call(kernel, **kw)(*args)

    return call
