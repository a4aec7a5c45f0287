"""Pure-NumPy PLY reader/writer.

Replaces the reference's PCL PLY I/O (reference: src/rgbd.cpp:12-56,
pcl::io::loadPLYFile / savePLYFile). Supports ascii and
binary_little_endian vertex clouds, which covers the bundled models
(models/*/textured_vertices.ply are ascii) and our own artifacts.
"""

from __future__ import annotations

import io as _io
from typing import Dict, List, Optional, Tuple

import numpy as np

_PLY_DTYPES = {
    "char": np.int8, "int8": np.int8,
    "uchar": np.uint8, "uint8": np.uint8,
    "short": np.int16, "int16": np.int16,
    "ushort": np.uint16, "uint16": np.uint16,
    "int": np.int32, "int32": np.int32,
    "uint": np.uint32, "uint32": np.uint32,
    "float": np.float32, "float32": np.float32,
    "double": np.float64, "float64": np.float64,
}


def _parse_header(f) -> Tuple[str, List[Tuple[str, int, List[Tuple[str, str]]]]]:
    magic = f.readline().strip()
    if magic != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    elements: List[Tuple[str, int, List[Tuple[str, str]]]] = []
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in PLY header")
        tokens = line.decode("ascii", "replace").strip().split()
        if not tokens:
            continue
        if tokens[0] == "comment" or tokens[0] == "obj_info":
            continue
        if tokens[0] == "format":
            fmt = tokens[1]
        elif tokens[0] == "element":
            elements.append((tokens[1], int(tokens[2]), []))
        elif tokens[0] == "property":
            if tokens[1] == "list":
                elements[-1][2].append((tokens[-1], f"list:{tokens[2]}:{tokens[3]}"))
            else:
                elements[-1][2].append((tokens[-1], tokens[1]))
        elif tokens[0] == "end_header":
            break
    if fmt is None:
        raise ValueError("PLY header missing format line")
    return fmt, elements


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Read the `vertex` element of a PLY file into a dict of 1-D arrays
    keyed by property name."""
    with open(path, "rb") as f:
        fmt, elements = _parse_header(f)
        body = f.read()

    vertex = next((e for e in elements if e[0] == "vertex"), None)
    if vertex is None:
        raise ValueError("PLY file has no vertex element")
    _, count, props = vertex
    if any(t.startswith("list:") for _, t in props):
        raise ValueError("list properties on vertex element are unsupported")

    names = [n for n, _ in props]
    if fmt == "ascii":
        # Vertex element is always first in the files we handle; trailing
        # elements (faces) are ignored.
        want = count * len(names)
        data = None
        try:
            from .. import native

            vals = native.parse_floats(body, want)
            if vals is not None and vals.shape[0] >= want:
                data = vals[:want].astype(np.float64).reshape(
                    count, len(names)
                )
        except Exception:
            data = None
        if data is None:
            text = body.decode("ascii", "replace")
            data = np.loadtxt(
                _io.StringIO(text), dtype=np.float64, max_rows=count, ndmin=2
            )
        if data.shape[0] != count or data.shape[1] != len(names):
            raise ValueError(
                f"expected {count}x{len(names)} ascii vertex table, got {data.shape}"
            )
        out = {}
        for i, (n, t) in enumerate(props):
            out[n] = data[:, i].astype(_PLY_DTYPES[t])
        return out
    elif fmt == "binary_little_endian":
        dtype = np.dtype([(n, _PLY_DTYPES[t].__name__) for n, t in props])
        arr = np.frombuffer(body, dtype=dtype, count=count)
        return {n: np.ascontiguousarray(arr[n]) for n in names}
    else:
        raise ValueError(f"unsupported PLY format {fmt!r}")


def read_ply_cloud(path: str, scale: float = 1.0):
    """Load a PLY into (pos, normal, rgb) arrays, mirroring the reference's
    load_ply_model (reference: src/rgbd.cpp:12-33): points with non-finite
    normals are dropped, positions are scaled, normals re-normalized.

    Returns (pos[N,3] f32, normal[N,3] f32 or None, rgb[N,3] f32 or None).
    """
    v = read_ply(path)
    pos = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    normal = None
    rgb = None
    if all(k in v for k in ("nx", "ny", "nz")):
        normal = np.stack([v["nx"], v["ny"], v["nz"]], axis=1).astype(np.float32)
    elif all(k in v for k in ("normal_x", "normal_y", "normal_z")):
        normal = np.stack(
            [v["normal_x"], v["normal_y"], v["normal_z"]], axis=1
        ).astype(np.float32)
    if all(k in v for k in ("red", "green", "blue")):
        rgb = np.stack([v["red"], v["green"], v["blue"]], axis=1).astype(np.float32)
    elif all(k in v for k in ("r", "g", "b")):
        rgb = np.stack([v["r"], v["g"], v["b"]], axis=1).astype(np.float32)

    if normal is not None:
        keep = np.isfinite(normal).all(axis=1)
        pos = pos[keep]
        normal = normal[keep]
        if rgb is not None:
            rgb = rgb[keep]
        norms = np.linalg.norm(normal, axis=1, keepdims=True)
        normal = np.where(norms > 0, normal / np.maximum(norms, 1e-30), normal)

    pos = pos * np.float32(scale)
    return pos, normal, rgb


def write_ply(
    path: str,
    pos: np.ndarray,
    normal: Optional[np.ndarray] = None,
    rgb: Optional[np.ndarray] = None,
    scale: float = 1.0,
    binary: bool = False,
) -> None:
    """Write a vertex cloud, mirroring the reference's save_as_ply
    (reference: src/rgbd.cpp:35-56): positions scaled on write, normals and
    uchar rgb included when present."""
    pos = np.asarray(pos, dtype=np.float32) * np.float32(scale)
    n = pos.shape[0]
    fields = [("x", pos[:, 0]), ("y", pos[:, 1]), ("z", pos[:, 2])]
    if normal is not None:
        normal = np.asarray(normal, dtype=np.float32)
        fields += [("nx", normal[:, 0]), ("ny", normal[:, 1]), ("nz", normal[:, 2])]
    if rgb is not None:
        rgbu = np.clip(np.asarray(rgb), 0, 255).astype(np.uint8)
        fields += [("red", rgbu[:, 0]), ("green", rgbu[:, 1]), ("blue", rgbu[:, 2])]

    header = ["ply"]
    header.append(
        "format binary_little_endian 1.0" if binary else "format ascii 1.0"
    )
    header.append("comment model_matching_tpu generated")
    header.append(f"element vertex {n}")
    for name, col in fields:
        t = "uchar" if col.dtype == np.uint8 else "float"
        header.append(f"property {t} {name}")
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if binary:
            dtype = np.dtype(
                [(name, col.dtype.name) for name, col in fields]
            )
            rec = np.empty(n, dtype=dtype)
            for name, col in fields:
                rec[name] = col
            f.write(rec.tobytes())
        else:
            cols = np.column_stack([c.astype(np.float64) for _, c in fields])
            np.savetxt(f, cols, fmt="%.9g")
