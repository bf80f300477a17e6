"""Offline point-cloud visualization.

Functional counterpart of the reference's mayavi room renderer
(utils/visualization.py:26-75): reassemble full rooms from saved block
indices and render RGB / ground-truth / prediction colorings.  This image
has no GUI stack, so rendering targets matplotlib (PNG scatter) and
colored-PLY export (viewable in MeshLab/CloudCompare); the reassembly
logic is the load-bearing part.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from crfconv_tpu.data.ply import write_ply

# 13-class S3DIS palette (uint8 RGB)
S3DIS_PALETTE = np.array(
    [
        [233, 229, 107], [95, 156, 196], [179, 116, 81], [241, 149, 131],
        [81, 163, 148], [77, 174, 84], [108, 135, 75], [41, 49, 101],
        [79, 79, 76], [223, 52, 52], [89, 47, 95], [81, 109, 114],
        [233, 233, 229],
    ],
    dtype=np.uint8,
)


def assemble_room(
    blocks: Sequence[Dict[str, np.ndarray]],
    num_points: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reassemble a room from overlapping blocks.

    Each block dict carries ``pos [n,3]``, ``indices [n]`` (original room
    point ids) and per-point values (``pred``/``y``).  Later blocks
    overwrite earlier ones on overlap, as the reference's index-based
    reassembly does (utils/visualization.py:26-36).

    Returns (positions [N,3], filled_mask [N]).
    """
    n = num_points or (max(int(b["indices"].max()) for b in blocks) + 1)
    pos = np.zeros((n, 3), np.float32)
    filled = np.zeros(n, bool)
    for b in blocks:
        idx = np.asarray(b["indices"], np.int64)
        pos[idx] = b["pos"]
        filled[idx] = True
    return pos, filled


def assemble_values(
    blocks: Sequence[Dict[str, np.ndarray]],
    key: str,
    num_points: Optional[int] = None,
) -> np.ndarray:
    n = num_points or (max(int(b["indices"].max()) for b in blocks) + 1)
    first = np.asarray(blocks[0][key])
    out = np.zeros((n,) + first.shape[1:], first.dtype)
    for b in blocks:
        out[np.asarray(b["indices"], np.int64)] = b[key]
    return out


def labels_to_colors(
    labels: np.ndarray, palette: np.ndarray = S3DIS_PALETTE
) -> np.ndarray:
    labels = np.clip(np.asarray(labels, np.int64), 0, len(palette) - 1)
    return palette[labels]


def export_colored_ply(
    filename: str,
    pos: np.ndarray,
    labels: Optional[np.ndarray] = None,
    rgb: Optional[np.ndarray] = None,
    palette: np.ndarray = S3DIS_PALETTE,
) -> str:
    """Write a colored PLY (labels → palette colors, or raw rgb)."""
    if rgb is None:
        if labels is None:
            raise ValueError("need labels or rgb")
        rgb = labels_to_colors(labels, palette)
    rgb = np.asarray(rgb)
    if rgb.dtype != np.uint8:
        rgb = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    write_ply(filename, [np.asarray(pos, np.float32), rgb],
              ["x", "y", "z", "r", "g", "b"])
    return filename


def render_png(
    filename: str,
    pos: np.ndarray,
    labels: Optional[np.ndarray] = None,
    rgb: Optional[np.ndarray] = None,
    palette: np.ndarray = S3DIS_PALETTE,
    max_points: int = 200_000,
    elev: float = 35.0,
    azim: float = -60.0,
) -> str:
    """Top-down-ish 3-D scatter render to PNG via matplotlib (headless)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pos = np.asarray(pos)
    if rgb is None:
        rgb = labels_to_colors(labels, palette)
    rgb = np.asarray(rgb, np.float64)
    if rgb.max() > 1.0:
        rgb = rgb / 255.0
    if pos.shape[0] > max_points:
        sel = np.random.default_rng(0).permutation(pos.shape[0])[:max_points]
        pos, rgb = pos[sel], rgb[sel]
    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], c=rgb, s=0.3, linewidths=0)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    fig.savefig(filename, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return filename
