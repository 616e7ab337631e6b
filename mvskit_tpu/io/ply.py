"""PLY point-cloud I/O.

Fresh implementation of the subset of PLY the pipeline needs (the
reference vendors RPly and adapts it in io/io_file.{h,c}: header scan,
vertex read with x/y/z + optional nx/ny/nz + rgb, ascii or binary
write — reference io_file.c:20-341, patch_manager.cpp:542-668).
Supports ascii 1.0 and binary_little_endian 1.0, float/double/uchar/int
scalar properties; list properties (faces) are skipped on read.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}

_RGB_NAMES = (
    ("red", "green", "blue"),
    ("diffuse_red", "diffuse_green", "diffuse_blue"),
    ("r", "g", "b"),
)


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Read vertices. Returns dict with 'xyz' [N,3] float64 and, when
    present, 'normal' [N,3] and 'rgb' [N,3] uint8.

    Tries the native C++ reader (io/native.py) first — the analog of the
    reference's native PLY layer (io/io_file.c) — and falls back to the
    pure-Python parser for anything it declines."""
    from . import native

    out = native.read_ply(path)
    if out is not None:
        return out
    return _read_ply_py(path)


def _read_ply_py(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = f.read()

    # ---- header ----
    if not data.startswith(b"ply"):
        raise ValueError(f"not a PLY file: {path}")
    end = data.find(b"end_header")
    if end < 0:
        raise ValueError(f"PLY missing end_header: {path}")
    header = data[:end].decode("ascii", "replace").splitlines()
    body = data[data.find(b"\n", end) + 1 :]

    fmt = None
    elements = []  # (name, count, [(prop_name, dtype)|('__list__', ...)])
    for line in header[1:]:
        tok = line.split()
        if not tok:
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element":
            elements.append((tok[1], int(tok[2]), []))
        elif tok[0] == "property":
            if not elements:
                continue
            if tok[1] == "list":
                elements[-1][2].append(("__list__", tok[2], tok[3], tok[4]))
            else:
                elements[-1][2].append((tok[2], tok[1]))
        elif tok[0] == "comment" or tok[0] == "obj_info":
            continue

    vert = next((e for e in elements if e[0] == "vertex"), None)
    if vert is None:
        raise ValueError(f"PLY has no vertex element: {path}")
    _, count, props = vert
    if any(p[0] == "__list__" for p in props):
        raise ValueError("list property inside vertex element unsupported")
    names = [p[0] for p in props]
    types = [p[1] for p in props]

    if fmt == "ascii":
        ncols = len(names)
        vals = np.array(
            body.split()[: count * ncols], dtype=np.float64
        ).reshape(count, ncols)
        cols = {n: vals[:, i] for i, n in enumerate(names)}
    elif fmt == "binary_little_endian":
        dt = np.dtype([(n, "<" + _DTYPES[t]) for n, t in zip(names, types)])
        rec = np.frombuffer(body, dtype=dt, count=count)
        cols = {n: rec[n].astype(np.float64) for n in names}
    else:
        raise ValueError(f"unsupported PLY format {fmt}")

    out: Dict[str, np.ndarray] = {}
    out["xyz"] = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    if all(n in cols for n in ("nx", "ny", "nz")):
        out["normal"] = np.stack([cols["nx"], cols["ny"], cols["nz"]], axis=1)
    for rn in _RGB_NAMES:
        if all(n in cols for n in rn):
            out["rgb"] = np.stack(
                [cols[rn[0]], cols[rn[1]], cols[rn[2]]], axis=1
            ).astype(np.uint8)
            break
    return out


def write_ply(
    path: str,
    xyz: np.ndarray,
    normal: Optional[np.ndarray] = None,
    rgb: Optional[np.ndarray] = None,
    binary: bool = False,
    rgb_names=("diffuse_red", "diffuse_green", "diffuse_blue"),
) -> None:
    """Write a point cloud. Defaults to the reference's layout:
    x y z [nx ny nz] [diffuse_red diffuse_green diffuse_blue]
    (reference patch_manager.cpp:545-557)."""
    xyz = np.asarray(xyz, dtype=np.float32)
    n = xyz.shape[0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if tuple(rgb_names) == ("diffuse_red", "diffuse_green", "diffuse_blue"):
        from . import native

        if native.write_ply(path, xyz, normal=normal, rgb=rgb, binary=binary):
            return
    lines = [
        "ply",
        "format binary_little_endian 1.0" if binary else "format ascii 1.0",
        f"element vertex {n}",
        "property float x",
        "property float y",
        "property float z",
    ]
    if normal is not None:
        normal = np.asarray(normal, dtype=np.float32)
        lines += ["property float nx", "property float ny", "property float nz"]
    if rgb is not None:
        rgb = np.asarray(rgb, dtype=np.uint8)
        lines += [f"property uchar {c}" for c in rgb_names]
    lines.append("end_header")
    header = "\n".join(lines) + "\n"

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if binary:
        fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
        if normal is not None:
            fields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
        if rgb is not None:
            fields += [(c, "u1") for c in rgb_names]
        rec = np.zeros(n, dtype=np.dtype(fields))
        rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        if normal is not None:
            rec["nx"], rec["ny"], rec["nz"] = (
                normal[:, 0], normal[:, 1], normal[:, 2],
            )
        if rgb is not None:
            for i, c in enumerate(rgb_names):
                rec[c] = rgb[:, i]
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(rec.tobytes())
    else:
        with open(path, "w") as f:
            f.write(header)
            for i in range(n):
                parts = [repr(float(v)) for v in xyz[i]]
                if normal is not None:
                    parts += [repr(float(v)) for v in normal[i]]
                if rgb is not None:
                    parts += [str(int(v)) for v in rgb[i]]
                f.write(" ".join(parts) + "\n")
