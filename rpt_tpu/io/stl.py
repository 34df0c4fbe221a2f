"""STL mesh loading (binary + ASCII with autodetection).

TPU-native counterpart of /root/reference/src/io.rs:260-359: binary format is
detected by the 84 + 50*n size check; otherwise a `solid ` prefix selects the
ASCII parser. The facet normal is used for all three vertices, as in the
reference.
"""

from __future__ import annotations

import io as _io
import os
import struct

import numpy as np

from ..shapes import Mesh

__all__ = ["load_stl"]


def load_stl(path) -> Mesh:
    if hasattr(path, "read"):
        data = path.read()
    else:
        with open(path, "rb") as fh:
            data = fh.read()
    size = len(data)
    if size < 15:
        raise ValueError("Loaded .STL file is too short")
    if size >= 84:
        (num_triangles,) = struct.unpack_from("<I", data, 80)
        if size == 84 + num_triangles * 50:
            return _load_binary(data, num_triangles)
    if data[:6] == b"solid ":
        return _load_ascii(data.decode("utf-8", errors="replace"))
    raise ValueError("Loaded .STL file, but could not determine format")


def _load_binary(data: bytes, num_triangles: int) -> Mesh:
    # Each record: normal (3f), v1 (3f), v2 (3f), v3 (3f), u16 attribute
    rec = np.frombuffer(data[84 : 84 + num_triangles * 50], dtype=np.uint8)
    rec = rec.reshape(num_triangles, 50)
    floats = rec[:, :48].copy().view("<f4").reshape(num_triangles, 4, 3).astype(np.float64)
    vn = floats[:, 0]
    verts = floats[:, 1:4]
    norms = np.repeat(vn[:, None, :], 3, axis=1)
    return Mesh(verts, norms)


def _load_ascii(text: str) -> Mesh:
    lines = iter(text.splitlines()[1:])
    verts, norms = [], []
    for line in lines:
        line = line.strip()
        if not line.startswith("facet normal "):
            if line.startswith("endsolid"):
                break
            continue
        vn = np.array([float(t) for t in line[len("facet normal ") :].split()])
        next(lines)  # outer loop
        vs = []
        for _ in range(3):
            vline = next(lines).strip()
            assert vline.startswith("vertex "), vline
            vs.append(np.array([float(t) for t in vline[len("vertex ") :].split()]))
        next(lines)  # endloop
        next(lines)  # endfacet
        verts.append(np.stack(vs))
        norms.append(np.repeat(vn[None, :], 3, axis=0))
    return Mesh(np.stack(verts), np.stack(norms))
