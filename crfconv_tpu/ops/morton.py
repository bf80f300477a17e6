"""Morton (Z-order) space-filling-curve codes for spatial locality sorting.

The windowed neighborhood regime (ops/windowed.py) requires points to be
ordered so that spatial neighbors are index neighbors; Morton order gives
that with a cheap bit-interleave.  Both a jittable JAX version (device
pipelines) and a numpy version (host pipelines) are provided.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BITS = 10  # 10 bits/axis -> 30-bit codes, fits int32 grids of 1024^3


def _spread_bits_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x3FF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
    return x


def morton_code_np(pos: np.ndarray) -> np.ndarray:
    """[..., 3] float positions → [...] uint64 Morton codes."""
    pos = np.asarray(pos, np.float64)
    mn = pos.min(axis=-2, keepdims=True)
    span = np.maximum(pos.max(axis=-2, keepdims=True) - mn, 1e-9)
    q = np.clip(
        (pos - mn) / span * (2**BITS - 1), 0, 2**BITS - 1
    ).astype(np.uint64)
    return (
        _spread_bits_np(q[..., 0])
        | (_spread_bits_np(q[..., 1]) << np.uint64(1))
        | (_spread_bits_np(q[..., 2]) << np.uint64(2))
    )


def morton_order_np(pos: np.ndarray) -> np.ndarray:
    """Permutation sorting points into Morton order (stable)."""
    return np.argsort(morton_code_np(pos), axis=-1, kind="stable")


def _spread_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_code(pos: jnp.ndarray) -> jnp.ndarray:
    """Jittable: [..., N, 3] positions → [..., N] uint32-pair-packed codes.

    Returns int64-comparable codes as uint32 pairs packed into one
    float-sortable representation is unnecessary — jnp supports uint32
    sorting; the 30-bit code fits uint32 exactly.
    """
    mn = jnp.min(pos, axis=-2, keepdims=True)
    span = jnp.maximum(jnp.max(pos, axis=-2, keepdims=True) - mn, 1e-9)
    q = jnp.clip(
        (pos - mn) / span * (2**BITS - 1), 0, 2**BITS - 1
    ).astype(jnp.uint32)
    return (
        _spread_bits(q[..., 0])
        | (_spread_bits(q[..., 1]) << 1)
        | (_spread_bits(q[..., 2]) << 2)
    )


def morton_order(pos: jnp.ndarray) -> jnp.ndarray:
    """Jittable argsort into Morton order along the point axis."""
    return jnp.argsort(morton_code(pos), axis=-1).astype(jnp.int32)
