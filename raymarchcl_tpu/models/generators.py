"""Procedural voxel volumes (gyroid, terrain).

TPU-native re-design of the reference's single-threaded triple-loop
generators (reference: src/thi/ng/raymarchcl/generators.clj:18-60) — the
slowest component of the reference (minutes at 512^3). Here the whole volume
is evaluated as vectorized jnp expressions in z-slabs (seconds on one chip,
works on CPU too). Byte values are identical: the reference writes Java
signed bytes 64 / -128 / -1 which the device reads as uchar 64 / 128 / 255.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:  # native C++ fast path (optional)
    from ..native import binding as _native
except Exception:  # pragma: no cover
    _native = None


def gyroid(s, t, p, o):
    """Gyroid field value (reference: generators.clj:18-25).

    p is (..., 3); evaluates | cos x sin z + cos y sin x + cos z sin y | - t
    at p*s + o.
    """
    p = jnp.asarray(p, dtype=jnp.float32)
    q = p * s + jnp.asarray(o, dtype=jnp.float32)
    x, y, z = q[..., 0], q[..., 1], q[..., 2]
    return (
        jnp.abs(jnp.cos(x) * jnp.sin(z) + jnp.cos(y) * jnp.sin(x) + jnp.cos(z) * jnp.sin(y))
        - t
    )


def _gyroid_slab_np(z0, n, rx, ry, scl):
    """One z-slab of the sliced gyroid volume in numpy float64 — matches the
    native C++ double-precision path (bit-stable volumes across machines,
    unlike float32 jnp where threshold voxels flip)."""
    zs = np.arange(z0, z0 + n)
    x = np.arange(rx, dtype=np.float64) * scl + 0.3875
    y = np.arange(ry, dtype=np.float64) * scl
    z = zs.astype(np.float64) * scl
    v = np.abs(
        np.cos(x)[None, None, :] * np.sin(z)[:, None, None]
        + np.cos(y)[None, :, None] * np.sin(x)[None, None, :]
        + np.cos(z)[:, None, None] * np.sin(y)[None, :, None]
    ) - 1.0
    xi = np.arange(rx)[None, None, :]
    shell = np.abs(0.2 - v) < 0.05  # generators.clj:39
    stripe = (xi & 0x3F) < 32  # generators.clj:40
    interior = v > 0.35  # generators.clj:41
    vox = np.where(
        shell, np.where(stripe, np.uint8(64), np.uint8(128)),
        np.where(interior, np.uint8(255), np.uint8(0)),
    ).astype(np.uint8)
    zmask = (zs & 0x3F) >= 32  # z-slicing (generators.clj:35)
    vox[~zmask] = 0
    return vox


def _gyroid_slab(z0, rx, ry, slab, scl):
    """One z-slab of the sliced gyroid volume; static shapes for jit."""
    zs = z0 + jnp.arange(slab)
    x = jnp.arange(rx, dtype=jnp.float32)
    y = jnp.arange(ry, dtype=jnp.float32)
    zf = zs.astype(jnp.float32)
    # broadcast to (slab, ry, rx, 3) without materializing a meshgrid
    p = jnp.stack(
        jnp.broadcast_arrays(
            x[None, None, :], y[None, :, None], zf[:, None, None]
        ),
        axis=-1,
    )
    v = gyroid(scl, 1.0, p, (0.3875, 0.0, 0.0))  # generators.clj:33 offset/scale
    xi = jnp.arange(rx)[None, None, :]
    shell = jnp.abs(0.2 - v) < 0.05  # generators.clj:39
    stripe = (xi & 0x3F) < 32  # generators.clj:40
    interior = v > 0.35  # generators.clj:41
    vox = jnp.where(
        shell,
        jnp.where(stripe, jnp.uint8(64), jnp.uint8(128)),
        jnp.where(interior, jnp.uint8(255), jnp.uint8(0)),
    )
    # z-slicing: only bands where (z & 0x3f) >= 32 are populated (generators.clj:35)
    zmask = (zs & 0x3F) >= 32
    return jnp.where(zmask[:, None, None], vox, jnp.uint8(0))


def make_gyroid_volume(opts_or_vres, slab=None) -> np.ndarray:
    """Sliced gyroid volume (reference: generators.clj:27-42).

    Accepts a dict with key 'vres' (reference API shape) or an int/triple.
    Returns a flat uint8 array of rx*ry*rz voxels, index z*(rx*ry)+y*rx+x.
    """
    rx, ry, rz = _vres3(opts_or_vres)
    scl = 0.01 * (512.0 / rx)  # generators.clj:33
    if _native is not None and _native.available():
        return _native.gyroid_volume(rx, ry, rz, scl)
    if slab is None:
        slab = max(1, min(rz, (1 << 24) // max(1, rx * ry)))  # ~16M voxels/slab
    out = np.empty(rx * ry * rz, dtype=np.uint8)
    for z0 in range(0, rz, slab):
        n = min(slab, rz - z0)
        chunk = _gyroid_slab_np(z0, n, rx, ry, scl)
        out[z0 * rx * ry : (z0 + n) * rx * ry] = chunk.reshape(-1)
    return out


def make_terrain(opts_or_vres) -> np.ndarray:
    """Walls + sinusoidal pillar terrain demo volume
    (reference: generators.clj:44-60). Vectorized numpy."""
    rx, ry, rz = _vres3(opts_or_vres)
    if _native is not None and _native.available():
        return _native.terrain_volume(rx, ry, rz)
    vox = np.zeros((rz, ry, rx), dtype=np.uint8)
    wall_y = int(ry * 0.666)
    # wall 1: vox[z, y, x] = 64 for z<4 (generators.clj:50)
    vox[:4, :wall_y, :] = 64
    # wall 2: flat index x*rxy + y*rx + (rx-1-z) for z<4 (generators.clj:51).
    # The index iterates x over SLABS; the reference assumes cubic volumes —
    # clamp to min(rx, rz) slabs for non-cubic grids (matches native path)
    for z in range(4):
        if rx - 1 - z >= 0:
            vox[: min(rx, rz), :wall_y, rx - 1 - z] = 64
    # pillars (generators.clj:52-59)
    x = np.arange(rx)
    z = np.arange(rz)
    dx = 16 - (x % 32)
    dz = 16 - (z % 32)
    r = dz[:, None] ** 2 + dx[None, :] ** 2  # (rz, rx)
    inside = r <= 121
    h = (
        ry * (0.25 + 0.125 * np.sin(z[:, None] * 0.02) * np.cos(x[None, :] * 0.03))
    ).astype(np.int32)  # (rz, rx)
    y = np.arange(ry)
    fill = (y[None, :, None] <= h[:, None, :]) & inside[:, None, :]
    vox[fill] = 255
    return vox.reshape(-1)


def _vres3(opts_or_vres):
    if isinstance(opts_or_vres, dict):
        vres = opts_or_vres["vres"]
    else:
        vres = opts_or_vres
    if isinstance(vres, (int, np.integer)):
        vres = (int(vres),) * 3
    rx, ry, rz = (int(v) for v in vres)
    return rx, ry, rz
