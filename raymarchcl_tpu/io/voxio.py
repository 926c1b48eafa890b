"""`.vox` volume file format, byte-compatible with the reference.

Format (reference: src/thi/ng/raymarchcl/io.clj:9-17):
    bytes 0-4   magic "VOXEL"
    3 x int32   big-endian resx, resy, resz (Java DataOutputStream)
    1 x uint8   element size in bytes (always 1)
    raw voxels  resx*resy*resz bytes, index = z*(rx*ry) + y*rx + x

Voxel values are stored as Java signed bytes in the reference (e.g. -1, -128)
but consumed as `uchar` on the device (renderer.cl:86), so we read/write
uint8 throughout.
"""

from __future__ import annotations

import os
import struct as _struct

import numpy as np

MAGIC = b"VOXEL"

# Prefer the native C++ fast path when built (raymarchcl_tpu/native).
try:  # pragma: no cover - exercised when the native lib is built
    from ..native import binding as _native
except Exception:  # pragma: no cover
    _native = None


def save_volume(path, res, voxels: np.ndarray) -> None:
    """Write a volume. `res` may be an int (cubic, like the reference which
    only supports cubic saves, io.clj:9-17) or an (rx, ry, rz) triple."""
    if isinstance(res, (int, np.integer)):
        res = (int(res), int(res), int(res))
    rx, ry, rz = (int(r) for r in res)
    voxels = np.ascontiguousarray(voxels, dtype=np.uint8).reshape(-1)
    if voxels.size != rx * ry * rz:
        raise ValueError(f"volume size {voxels.size} != {rx}*{ry}*{rz}")
    if _native is not None and _native.available():
        _native.save_volume(path, rx, ry, rz, voxels)
        return
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(_struct.pack(">iii", rx, ry, rz))  # big-endian, io.clj:13-15
        f.write(_struct.pack("B", 1))  # element size
        f.write(voxels.tobytes())


def load_volume(path):
    """Read a volume -> (voxels uint8 flat array, (rx, ry, rz)).

    Unlike the reference (which returns an opaque CL buffer, io.clj:19-33),
    we return the resolution too so callers can derive voxelRes from the
    volume actually loaded instead of trusting a separately-passed vres.
    """
    if _native is not None and _native.available() and os.path.isfile(path):
        return _native.load_volume(path)
    with open(path, "rb") as f:
        magic = f.read(5)
        if magic != MAGIC:
            raise ValueError(f"{path}: bad magic {magic!r}, expected {MAGIC!r}")
        rx, ry, rz = _struct.unpack(">iii", f.read(12))
        (elem_size,) = _struct.unpack("B", f.read(1))
        if elem_size != 1:
            raise ValueError(f"{path}: unsupported element size {elem_size}")
        n = rx * ry * rz
        voxels = np.frombuffer(f.read(n), dtype=np.uint8)
        if voxels.size != n:
            raise ValueError(f"{path}: truncated volume ({voxels.size}/{n} bytes)")
    return voxels, (rx, ry, rz)
