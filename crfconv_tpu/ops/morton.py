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


def morton_order(
    pos: jnp.ndarray, rot: "jnp.ndarray | None" = None
) -> jnp.ndarray:
    """Jittable argsort into Morton order along the point axis.

    ``rot`` ([3, 3]) rotates the coordinates used for CODING only — the
    curve walks a rotated grid, moving its discontinuity planes, while
    distances/gathers still see the true positions.  Two differently
    rotated orderings have nearly uncorrelated window misses (union
    recall 0.97 vs 0.86 single at t64-p128), which train-time jitter and
    multi-view eval exploit (VERDICT r3 #1).
    """
    if rot is not None:
        pos = pos @ rot.T
    return jnp.argsort(morton_code(pos), axis=-1).astype(jnp.int32)


def _rot45() -> np.ndarray:
    """The fixed second-view orientation: 45° about z then x.

    Morton curve jumps happen at axis-aligned power-of-2 planes; a 45°
    rotation puts the second view's jump planes oblique to the first's.
    Measured union window recall (t64-p128, uniform 8192): 0.973 vs
    0.860 for one view (see benchmarks/windowed_accuracy.py)."""
    c = s = np.float32(np.sqrt(0.5))
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    rx = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    return rz @ rx


def view_rotation(view: int) -> "jnp.ndarray | None":
    """Fixed curve orientation for multi-view eval. View 0 = identity."""
    if view == 0:
        return None
    base = _rot45()
    # further views: compose with 90° z-rotations for decorrelated jumps
    rz90 = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    np.float32)
    r = base
    for _ in range(view - 1):
        r = rz90 @ r
    return jnp.asarray(r)


def random_rotation(key: jax.Array) -> jnp.ndarray:
    """Uniform random rotation matrix (SO(3), via normalized quaternion)."""
    q = jax.random.normal(key, (4,), jnp.float32)
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        jnp.float32,
    )
