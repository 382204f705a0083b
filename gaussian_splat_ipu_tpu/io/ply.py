"""Scene IO: PLY / XYZ gaussian point-cloud loaders and a PLY writer.

From-scratch numpy PLY parser — the capability of the reference's vendored
happly + loader (src/splat/file_io.cpp:30-77, include/happly.h) without the
row-by-row C++ machinery: binary little/big-endian and ascii formats parse
into one structured-dtype numpy view (zero copies for the common
binary_little_endian case). A C++ fast path for huge binary files lives in
csrc/ (see io/native.py); this module is the always-available fallback and
the format authority.

Field set parity with the reference loader (file_io.cpp:62-77):
x/y/z, f_dc_0..2, opacity, scale_0..2, rot_0..3; we additionally read
f_rest_* (higher-order SH) when present, which the reference ignores.
"""

from __future__ import annotations

import dataclasses
import io as _io
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

_PLY_TO_NUMPY = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


@dataclasses.dataclass
class PlyElement:
    name: str
    count: int
    properties: List[Tuple[str, str]]  # (name, numpy dtype code)
    data: Optional[np.ndarray] = None  # structured array

    def column(self, name: str) -> np.ndarray:
        return np.asarray(self.data[name])


@dataclasses.dataclass
class PlyData:
    """Parsed PLY file: elements by name (reference happly::PLYData)."""

    elements: Dict[str, PlyElement]
    fmt: str

    def __getitem__(self, name: str) -> PlyElement:
        return self.elements[name]


def _parse_header(stream) -> Tuple[List[PlyElement], str, int]:
    magic = stream.readline().strip()
    if magic != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    elements: List[PlyElement] = []
    while True:
        line = stream.readline()
        if not line:
            raise ValueError("unterminated PLY header")
        tokens = line.decode("ascii", "replace").split()
        if not tokens or tokens[0] == "comment":
            continue
        if tokens[0] == "format":
            fmt = tokens[1]
        elif tokens[0] == "element":
            elements.append(PlyElement(tokens[1], int(tokens[2]), []))
        elif tokens[0] == "property":
            if tokens[1] == "list":
                raise NotImplementedError(
                    "list properties are not used by gaussian-splat PLYs")
            code = _PLY_TO_NUMPY[tokens[1]]
            elements[-1].properties.append((tokens[2], code))
        elif tokens[0] == "end_header":
            break
    if fmt is None:
        raise ValueError("PLY header missing format line")
    return elements, fmt, stream.tell()


def read_ply(path: str) -> PlyData:
    """Parse a PLY file into structured numpy arrays."""
    with open(path, "rb") as f:
        elements, fmt, offset = _parse_header(f)
        if fmt == "ascii":
            text = f.read().decode("ascii")
            rows = text.split()
            pos = 0
            for el in elements:
                width = len(el.properties)
                dt = np.dtype([(n, c) for n, c in el.properties])
                flat = np.array(rows[pos:pos + el.count * width])
                pos += el.count * width
                table = flat.reshape(el.count, width)
                rec = np.empty(el.count, dt)
                for i, (n, c) in enumerate(el.properties):
                    rec[n] = table[:, i].astype(np.dtype(c))
                el.data = rec
        else:
            endian = "<" if fmt == "binary_little_endian" else ">"
            for el in elements:
                dt = np.dtype([(n, endian + c) for n, c in el.properties])
                buf = f.read(dt.itemsize * el.count)
                el.data = np.frombuffer(buf, dt, count=el.count)
    return PlyData({el.name: el for el in elements}, fmt)


def write_ply(path: str, columns: Dict[str, np.ndarray],
              element: str = "vertex") -> None:
    """Write float32 columns as a binary_little_endian PLY (checkpoints)."""
    names = list(columns)
    count = len(next(iter(columns.values())))
    header = ["ply", "format binary_little_endian 1.0",
              f"element {element} {count}"]
    header += [f"property float {n}" for n in names]
    header.append("end_header\n")
    dt = np.dtype([(n, "<f4") for n in names])
    rec = np.empty(count, dt)
    for n in names:
        rec[n] = np.asarray(columns[n], np.float32)
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(rec.tobytes())


_F_REST_RE = re.compile(r"^f_rest_(\d+)$")


def gaussian_fields_from_ply(ply: PlyData):
    """Extract the 3DGS field set from a parsed PLY.

    Returns dict with means (N,3), f_dc (N,3), opacity (N,), log_scales
    (N,3), quats (N,4) and optional f_rest (N, M, 3) in standard 3DGS
    channel-major storage order. Field names follow the reference loader
    (src/splat/file_io.cpp:62-77).
    """
    from gaussian_splat_ipu_tpu.io import native

    v = ply["vertex"]
    cols = {n for n, _ in v.properties}

    def stack(names):
        fast = native.stack_f32_columns(v.data, names)
        if fast is not None:
            return fast
        return np.stack([v.column(n).astype(np.float32) for n in names], -1)

    out = {"means": stack(["x", "y", "z"])}
    if "f_dc_0" in cols:
        out["f_dc"] = stack(["f_dc_0", "f_dc_1", "f_dc_2"])
        out["opacity"] = v.column("opacity").astype(np.float32)
        out["log_scales"] = stack(["scale_0", "scale_1", "scale_2"])
        out["quats"] = stack(["rot_0", "rot_1", "rot_2", "rot_3"])
    rest = sorted((int(_F_REST_RE.match(n).group(1)), n)
                  for n in cols if _F_REST_RE.match(n))
    if rest:
        # 3DGS stores f_rest channel-major: all R coeffs, all G, all B.
        flat = np.stack([v.column(n).astype(np.float32) for _, n in rest], -1)
        m = flat.shape[1] // 3
        out["f_rest"] = flat.reshape(-1, 3, m).transpose(0, 2, 1)
    return out


def read_xyz(path: str) -> np.ndarray:
    """Load a whitespace-separated xyz text point cloud -> (N, 3) f32.

    Parity with the reference loadXyz (src/splat/file_io.cpp:11-28).
    """
    pts = np.loadtxt(path, dtype=np.float32, usecols=(0, 1, 2), ndmin=2)
    return pts.astype(np.float32)


def load_points(path: str):
    """Extension dispatch, parity with loadPoints (file_io.cpp:44-55)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "xyz":
        return {"means": read_xyz(path)}
    if ext == "ply":
        return gaussian_fields_from_ply(read_ply(path))
    raise ValueError(f"unsupported scene file extension: .{ext}")
