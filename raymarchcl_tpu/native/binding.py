"""ctypes binding for the native C++ data pipeline (rmcl_native.cpp).

Loads `librmcl_native.so` from this directory, building it with `make` on
first use if a toolchain is available. Consumers degrade gracefully to the
pure numpy/jnp paths when `available()` is False (e.g. no compiler).
Set RAYMARCHCL_TPU_NO_NATIVE=1 to force the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librmcl_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("RAYMARCHCL_TPU_NO_NATIVE"):
            return None
        if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            os.path.join(_DIR, "rmcl_native.cpp")
        ):
            try:
                subprocess.run(
                    ["make", "-s", "-C", _DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        c = ctypes.c_int32
        lib.rmcl_gyroid_volume.argtypes = [c, c, c, ctypes.c_float, u8p]
        lib.rmcl_terrain_volume.argtypes = [c, c, c, u8p]
        lib.rmcl_voxelize_points.argtypes = [
            f32p, ctypes.c_int64, c, f64p, f64p, ctypes.c_double, u8p,
        ]
        lib.rmcl_voxelize_ks.argtypes = [
            f32p, ctypes.c_int64, c, c, f64p, f64p, ctypes.c_double, u8p,
        ]
        lib.rmcl_voxelize_scatter.argtypes = [
            f32p, ctypes.c_int64, c, f64p, f64p, ctypes.c_double,
            ctypes.c_uint64, u8p,
        ]
        lib.rmcl_save_volume.argtypes = [ctypes.c_char_p, c, c, c, u8p]
        lib.rmcl_save_volume.restype = c
        lib.rmcl_load_volume_header.argtypes = [ctypes.c_char_p, i32p]
        lib.rmcl_load_volume_header.restype = c
        lib.rmcl_load_volume_data.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int64]
        lib.rmcl_load_volume_data.restype = c
        lib.rmcl_num_threads.restype = c
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def gyroid_volume(rx, ry, rz, scl) -> np.ndarray:
    lib = _load()
    out = np.empty(rx * ry * rz, dtype=np.uint8)
    lib.rmcl_gyroid_volume(rx, ry, rz, np.float32(scl), out)
    return out


def terrain_volume(rx, ry, rz) -> np.ndarray:
    lib = _load()
    out = np.empty(rx * ry * rz, dtype=np.uint8)
    lib.rmcl_terrain_volume(rx, ry, rz, out)
    return out


def voxelize_points(verts, res, off, pmin, scale) -> np.ndarray:
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float32)
    out = np.empty(res * res * res, dtype=np.uint8)
    lib.rmcl_voxelize_points(
        verts, verts.shape[0], res,
        np.ascontiguousarray(off, np.float64),
        np.ascontiguousarray(pmin, np.float64),
        np.float64(scale), out,
    )
    return out


def voxelize_ks(verts, res, ks, off, pmin, scale) -> np.ndarray:
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float32)
    out = np.empty(res * res * res, dtype=np.uint8)
    lib.rmcl_voxelize_ks(
        verts, verts.shape[0], res, ks,
        np.ascontiguousarray(off, np.float64),
        np.ascontiguousarray(pmin, np.float64),
        np.float64(scale), out,
    )
    return out


def voxelize_scatter(verts, res, off, pmin, scale, seed) -> np.ndarray:
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float32)
    out = np.empty(res * res * res, dtype=np.uint8)
    lib.rmcl_voxelize_scatter(
        verts, verts.shape[0], res,
        np.ascontiguousarray(off, np.float64),
        np.ascontiguousarray(pmin, np.float64),
        np.float64(scale), ctypes.c_uint64(int(seed) & (2**64 - 1)), out,
    )
    return out


def save_volume(path, rx, ry, rz, vox) -> None:
    lib = _load()
    rc = lib.rmcl_save_volume(
        str(path).encode(), rx, ry, rz, np.ascontiguousarray(vox, np.uint8)
    )
    if rc != 0:
        raise IOError(f"native save_volume failed ({rc}): {path}")


def load_volume(path):
    lib = _load()
    res = np.zeros(3, np.int32)
    rc = lib.rmcl_load_volume_header(str(path).encode(), res)
    if rc != 0:
        raise ValueError(f"native load_volume bad header ({rc}): {path}")
    rx, ry, rz = (int(v) for v in res)
    # a corrupt/truncated header reads as -1 (or garbage); fail like the
    # pure-Python loader instead of np.empty raising on a negative size or
    # attempting a huge allocation
    if not (0 < rx <= 1 << 14 and 0 < ry <= 1 << 14 and 0 < rz <= 1 << 14):
        raise ValueError(f"native load_volume bad header dims {rx}x{ry}x{rz}: {path}")
    out = np.empty(rx * ry * rz, dtype=np.uint8)
    rc = lib.rmcl_load_volume_data(str(path).encode(), out, out.size)
    if rc != 0:
        raise ValueError(f"native load_volume truncated ({rc}): {path}")
    return out, (rx, ry, rz)
