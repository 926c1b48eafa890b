"""Small vector helpers shared by the march/shade stages.

All renderer math is float32 SoA over a flat ray axis N: positions and
directions are (N, 3), scalars (N,).
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a, fallback=None):
    """Length-normalize along the last axis.

    OpenCL `normalize` of a zero vector is undefined; here degenerate lanes
    (which only occur on masked-out rays) get `fallback` (default +y) instead
    of NaN so garbage can never poison active lanes through arithmetic.
    """
    n2 = jnp.sum(a * a, axis=-1, keepdims=True)
    ok = n2 > 1e-24
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)
    out = a * inv
    if fallback is None:
        fallback = jnp.zeros_like(a).at[..., 1].set(1.0)
    return jnp.where(ok, out, fallback)


def mix(a, b, t):
    """OpenCL mix(): a + (b - a) * t."""
    return a + (b - a) * t


def reflect(v, n):
    """reflect() (reference: renderer.cl:271-273)."""
    return v - 2.0 * dot(v, n)[..., None] * n
