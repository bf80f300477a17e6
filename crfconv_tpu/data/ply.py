"""Minimal PLY point-cloud I/O (binary little-endian + ascii).

Functional replacement for the reference's PLY helpers
(utils/ply_utils.py:116-328): ``write_ply(filename, field_list, names)``
writes a single 'vertex' element with named properties; ``read_ply``
returns a dict name → column array.  Implemented from the PLY format
spec; no third-party plyfile dependency.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Union

import numpy as np

_NP_TO_PLY = {
    np.dtype("float32"): "float",
    np.dtype("float64"): "double",
    np.dtype("int32"): "int",
    np.dtype("int64"): "int",      # PLY has no int64; downcast
    np.dtype("uint8"): "uchar",
    np.dtype("int8"): "char",
    np.dtype("uint16"): "ushort",
    np.dtype("int16"): "short",
    np.dtype("uint32"): "uint",
}

_PLY_TO_NP = {
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
}


def write_ply(
    filename: str,
    field_list: Union[np.ndarray, Sequence[np.ndarray]],
    field_names: Sequence[str],
) -> bool:
    """Write columns as a binary PLY 'vertex' element.

    field_list: one array or a list of arrays; 2-D arrays contribute one
    property per column, in order, consuming names from field_names.
    """
    if not filename.endswith(".ply"):
        filename += ".ply"
    if isinstance(field_list, np.ndarray):
        field_list = [field_list]
    cols: List[np.ndarray] = []
    for f in field_list:
        f = np.asarray(f)
        if f.ndim == 1:
            cols.append(f)
        else:
            cols.extend(f[:, i] for i in range(f.shape[1]))
    if len(cols) != len(field_names):
        raise ValueError(
            f"{len(cols)} columns but {len(field_names)} names"
        )
    n = cols[0].shape[0]
    for c in cols:
        if c.shape[0] != n:
            raise ValueError("column length mismatch")

    fixed = []
    for c in cols:
        if c.dtype == np.int64:
            c = c.astype(np.int32)
        if c.dtype == np.float64:
            c = c.astype(np.float32)
        fixed.append(np.ascontiguousarray(c))
    cols = fixed

    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    for name, c in zip(field_names, cols):
        header.append(f"property {_NP_TO_PLY[c.dtype]} {name}")
    header.append("end_header")

    rec = np.rec.fromarrays(cols, names=list(field_names))
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        rec.tofile(f)
    return True


def read_ply(filename: str) -> Dict[str, np.ndarray]:
    """Read a PLY file's 'vertex' element → dict name → array."""
    with open(filename, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{filename}: not a PLY file")
        fmt = None
        n = None
        props: List[tuple] = []
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in header")
            tokens = line.decode("ascii", "replace").strip().split()
            if not tokens:
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                if tokens[1] == "vertex":
                    n = int(tokens[2])
                elif n is not None:
                    break  # only the vertex element is supported
            elif tokens[0] == "property" and n is not None:
                if tokens[1] == "list":
                    raise ValueError("list properties unsupported")
                props.append((tokens[2], _PLY_TO_NP[tokens[1]]))
            elif tokens[0] == "end_header":
                break
        if n is None:
            raise ValueError("no vertex element")

        if fmt == "ascii":
            data = np.loadtxt(f, dtype=np.float64, max_rows=n)
            data = np.atleast_2d(data)
            return {
                name: data[:, i].astype(np.dtype(dt))
                for i, (name, dt) in enumerate(props)
            }
        if fmt == "binary_big_endian":
            dtype = np.dtype([(name, ">" + dt) for name, dt in props])
        else:
            dtype = np.dtype([(name, "<" + dt) for name, dt in props])
        rec = np.fromfile(f, dtype=dtype, count=n)
        return {name: np.ascontiguousarray(rec[name]) for name, _ in props}
