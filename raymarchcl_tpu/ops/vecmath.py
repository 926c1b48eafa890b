"""SoA vector math: the renderer's 3-vectors are triples of flat (N,) arrays.

Why not (N, 3) arrays: TPU vector registers tile the two minor dimensions as
(8 sublanes, 128 lanes); an (N, 3) array pads its minor dim 3 -> 128, wasting
97.7% of every vector op. With one (N,) array per component, every op runs at
full lane occupancy. This single layout decision is worth ~40x on this
renderer's elementwise-heavy inner loops (measured on v5e).

V3 is a NamedTuple so it is automatically a pytree (works in lax.while_loop
carries, scan, shard_map) and supports arithmetic operators for readability.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # --- arithmetic (component-wise; scalars/(N,) arrays broadcast) -------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __radd__(self, o):
        return self.__add__(o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        if isinstance(o, V3):
            return V3(o.x - self.x, o.y - self.y, o.z - self.z)
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # --- conversions ------------------------------------------------------
    @staticmethod
    def from_array(a):
        """(..., 3) array -> V3 of (...,) components."""
        a = jnp.asarray(a)
        return V3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def const(v, like=None):
        """Constant 3-vector, optionally broadcast to the shape of `like`."""
        x, y, z = (jnp.float32(c) for c in v)
        if like is not None:
            shape = like.shape if hasattr(like, "shape") else like.x.shape
            x = jnp.broadcast_to(x, shape)
            y = jnp.broadcast_to(y, shape)
            z = jnp.broadcast_to(z, shape)
        return V3(x, y, z)

    def to_array(self):
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    def astype(self, dt):
        return V3(self.x.astype(dt), self.y.astype(dt), self.z.astype(dt))


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def norm(a: V3):
    return jnp.sqrt(dot(a, a))


def normalize(a: V3) -> V3:
    """Length-normalize. OpenCL `normalize` of a zero vector is undefined;
    degenerate lanes (only ever masked-out rays) get +y instead of NaN so
    garbage can't poison active lanes through arithmetic."""
    n2 = dot(a, a)
    ok = n2 > 1e-24
    inv = jnp.where(ok, jax_rsqrt(jnp.where(ok, n2, 1.0)), 0.0)
    return V3(
        jnp.where(ok, a.x * inv, 0.0),
        jnp.where(ok, a.y * inv, 1.0),
        jnp.where(ok, a.z * inv, 0.0),
    )


def jax_rsqrt(x):
    import jax.lax

    return jax.lax.rsqrt(x)


def mix(a, b, t):
    """OpenCL mix(): a + (b - a) * t. Works on scalars and V3."""
    return a + (b - a) * t


def reflect(v: V3, n: V3) -> V3:
    """reflect() (reference: renderer.cl:271-273)."""
    return v - n * (2.0 * dot(v, n))


def where3(mask, a: V3, b: V3) -> V3:
    """Per-lane select between two V3s; mask is (N,) bool."""
    return V3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def morton10(x, y, z):
    """Interleave 3x10-bit coords -> 30-bit Morton key (int32). Spatial
    locality key shared by the deferred shade sort (ops/render.py) and the
    per-loop compaction keys (ops/shade.py)."""

    def split(v):
        v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (split(x) | (split(y) << 1) | (split(z) << 2)).astype(jnp.int32)


def morton_quant_key(pos: V3) -> jnp.ndarray:
    """Morton code of a world position quantized to the renderer's [-2, 2]
    scene box at 10 bits/axis (the deferred pipeline's spatial key)."""
    scale = jnp.float32(1023.0 / 4.0)
    qk = lambda c: jnp.clip((c + 2.0) * scale, 0.0, 1023.0).astype(jnp.int32)
    return morton10(qk(pos.x), qk(pos.y), qk(pos.z))
