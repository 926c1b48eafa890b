"""Monte-Carlo sample table and per-pixel jitter state.

The reference's only randomness source is a host-generated table of 16384
unit-length 4-vectors indexed by hashed integer seeds
(reference: generators.clj:8-16 table; renderer.cl:142-144 `randFloat4`
`mcSamples[seed & 0x3fff]`; renderer.cl:467-476 per-pixel state).

We keep that architecture (it is branch-free and gather-friendly, which suits
the TPU well) but generate the table with JAX threefry instead of
java.util.Random, so renders are reproducible from an integer seed. An
arbitrary externally-generated table can be injected for exact-parity runs.

Distribution parity note: the reference draws each component uniformly in
[-1, 1) and normalizes the 4-vector WITHOUT rejection sampling, so directions
are cube-corner biased, not uniform on S^3. We replicate that construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..options import MC_TABLE_LENGTH

_U32 = jnp.uint32


def generate_scatter_offsets(num=MC_TABLE_LENGTH, seed=0, key=None):
    """(num, 4) float32 table of normalized 4-vectors
    (reference: generators.clj:8-16)."""
    if key is None:
        key = jax.random.PRNGKey(seed)
    v = jax.random.uniform(key, (num, 4), dtype=jnp.float32, minval=-1.0, maxval=1.0)
    m = 1.0 / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v * m


def make_mc_tables(n_passes, seed=0):
    """Stacked per-pass tables, shape (n_passes, num, 4) — the reference
    allocates `iter` independent tables (core.clj:137-138)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), n_passes)
    return jax.vmap(lambda k: generate_scatter_offsets(key=k))(keys)


def rand_float4(mc_table, seed_u32):
    """table[seed & 0x3fff] (reference: renderer.cl:142-144).

    seed_u32: uint32 array of any shape; returns (..., 4) float32.
    """
    idx = (seed_u32 & _U32(0x3FFF)).astype(jnp.int32)
    return jnp.take(mc_table, idx, axis=0)


def f2u32(x):
    """C-style (uint)(float_expr) cast as the reference kernels perform it.

    The reference feeds small (possibly slightly negative) float expressions
    through a C uint cast; on GPU hardware that truncates and wraps two's
    complement. XLA's float->uint conversion instead clamps negatives to 0,
    so we go through int32 (truncation) and bitcast to uint32.
    """
    return jnp.asarray(x, jnp.float32).astype(jnp.int32).astype(_U32)


def init_render_state(opts, mc_table, ids):
    """Per-pixel jitter state (reference: renderer.cl:467-476).

    ids: (N,) int32 flat pixel ids. Returns dict with
      mc_pos (N,4), mc_normal (N,3), pixel_pos (N,2), eye_pos (N,3).
    """
    w = opts.resolution[0]
    px = (ids % w).astype(jnp.float32)
    py = (ids // w).astype(jnp.float32)
    t = opts.time
    # seeds: (uint)(id*17) + (uint)(time*3141.3862f) etc. (renderer.cl:471-472)
    seed_pos = (ids * 17).astype(_U32) + f2u32(t * 3141.3862)
    seed_nrm = (ids * 37).astype(_U32) + f2u32(t * 1859.1467)
    mc_pos = rand_float4(mc_table, seed_pos)
    mc_normal_raw = rand_float4(mc_table, seed_nrm)[:, :3]
    mc_normal = mc_normal_raw / jnp.linalg.norm(mc_normal_raw, axis=-1, keepdims=True)
    pixel_pos = jnp.stack([px, py], axis=-1) + mc_pos[:, 2:4]  # subpixel jitter
    # DOF: eyePos += mcNormal.zxy * dof (renderer.cl:474)
    eye_pos = opts.eyePos[None, :] + mc_normal[:, (2, 0, 1)] * opts.dof
    return {
        "mc_pos": mc_pos,
        "mc_normal": mc_normal,
        "pixel_pos": pixel_pos,
        "eye_pos": eye_pos,
    }


def light_seed(opts, pixel_pos):
    """Jittered light-position seed (reference: renderer.cl:267)."""
    return f2u32(
        pixel_pos[:, 0] * 1957.0 + pixel_pos[:, 1] * 2173.0 + opts.time * 4763.742
    )


def ao_seed(opts, pos):
    """AO scatter seed from world position (reference: renderer.cl:334)."""
    return f2u32(
        pos[:, 0] * 3183.75
        + pos[:, 1] * 1831.42
        + pos[:, 2] * 2945.87
        + opts.time * 2671.918
    )
