"""Monte-Carlo sample table and per-pixel jitter state.

The reference's only randomness source is a host-generated table of 16384
unit-length 4-vectors indexed by hashed integer seeds
(reference: generators.clj:8-16 table; renderer.cl:142-144 `randFloat4`
`mcSamples[seed & 0x3fff]`; renderer.cl:467-476 per-pixel state).

We keep that architecture (branch-free, gather-friendly — a good fit for the
TPU) but generate the table with JAX threefry instead of java.util.Random,
so renders are reproducible from an integer seed; an externally-generated
table can be injected for exact-parity runs.

Device-side the table is consumed TRANSPOSED as (4, tableLen) so each
component lookup is a full-lane (N,) gather from a contiguous row (see
ops/vecmath.py for why minor-dim-4 layouts are poison on TPU).

Distribution parity note: the reference draws each component uniformly in
[-1, 1) and normalizes the 4-vector WITHOUT rejection sampling, so
directions are cube-corner biased, not uniform on S^3. We replicate that.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..options import MC_TABLE_LENGTH
from .vecmath import V3, normalize

_U32 = jnp.uint32
_I32 = jnp.int32


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


def transpose_table(table):
    """(T, 4) -> (4, T) contiguous for device-side component gathers."""
    return jnp.asarray(table).T


def transpose_table_stacked(tables):
    """(P, T, 4) per-pass tables -> (4, P*T): pass p's table occupies index
    block [p*T, (p+1)*T) of each component row. The stacked render engine
    (ops/render.py pass stacking) threads per-pass table identity through
    every seed site via _table_idx — trailing lane p reads pass p's table,
    exactly as the sequential per-pass renders would."""
    return jnp.transpose(jnp.asarray(tables), (2, 0, 1)).reshape(4, -1)


def _table_idx(table_t, seed_u32, block=None):
    """Masked table index (renderer.cl:142-144), plus the per-pass block
    offset when lanes are stacked (N, P) against a (4, P*T) stacked table:
    trailing lane p gathers from pass p's block.

    block: optional explicit lane-shaped int32 block offsets (p*T per
    lane) for POOLED lanes whose pass identity is not recoverable from
    the lane shape (per-lane compacted stacked secondaries,
    ops/render.py) — overrides the trailing-axis inference."""
    idx = (seed_u32 & _U32(0x3FFF)).astype(_I32)
    if block is not None:
        return idx + block
    if seed_u32.ndim == 2 and table_t.shape[1] > MC_TABLE_LENGTH:
        p = seed_u32.shape[1]
        assert table_t.shape[1] == p * MC_TABLE_LENGTH, (
            table_t.shape, seed_u32.shape,
        )
        idx = idx + jnp.arange(p, dtype=_I32) * MC_TABLE_LENGTH
    return idx


def _take_row(row, idx):
    """Component-row gather with multi-dim lane indices flattened (the fast
    1-D-start-index emitter form)."""
    if idx.ndim == 1:
        return jnp.take(row, idx)
    return jnp.take(row, idx.reshape(-1)).reshape(idx.shape)


def rand_float4(table_t, seed_u32, block=None):
    """table[seed & 0x3fff] (reference: renderer.cl:142-144).

    table_t: (4, T) transposed table (or (4, P*T) stacked — see
    transpose_table_stacked); seed_u32: uint32, lane-shaped ((N,) or (N, P)).
    block: see _table_idx. Returns (x, y, z, w) component arrays.
    """
    idx = _table_idx(table_t, seed_u32, block)
    return tuple(_take_row(table_t[c], idx) for c in range(4))


def rand_xyz(table_t, seed_u32, block=None) -> V3:
    idx = _table_idx(table_t, seed_u32, block)
    return V3(
        _take_row(table_t[0], idx),
        _take_row(table_t[1], idx),
        _take_row(table_t[2], idx),
    )


def f2u32(x):
    """C-style (uint)(float_expr) cast as the reference kernels perform it.

    The reference feeds small (possibly negative) float expressions through a
    C uint cast; hardware truncates and wraps two's complement. XLA's
    float->uint conversion clamps negatives to 0 instead, so go through
    int32 (truncation) and reinterpret as uint32.
    """
    return jnp.asarray(x, jnp.float32).astype(_I32).astype(_U32)


def init_render_state(opts, table_t, ids):
    """Per-pixel jitter state (reference: renderer.cl:467-476).

    ids: (N,) int32 GLOBAL flat pixel ids. Returns dict with
      px, py (N,) jittered pixel coords; mc_normal V3; eye_pos V3;
      mc_pos_zw kept inside px/py.

    Stacked passes (ops/render.py): when opts.time is a (P,) row of pass
    times (and table_t the (4, P*T) stacked table), all state broadcasts to
    (N, P) trailing-lane shape — lane (i, p) gets exactly the seeds/jitters
    the sequential pass p would give pixel i.
    """
    w = opts.resolution[0]
    pix_x = (ids % w).astype(jnp.float32)
    pix_y = (ids // w).astype(jnp.float32)
    t = opts.time
    if jnp.ndim(t) == 1:  # stacked (P,) pass times -> (N, P) lanes
        ids = ids[:, None]
        pix_x = pix_x[:, None]
        pix_y = pix_y[:, None]
    # seeds: (uint)(id*17) + (uint)(time*3141.3862f) etc. (renderer.cl:471-472)
    seed_pos = (ids * 17).astype(_U32) + f2u32(t * 3141.3862)
    seed_nrm = (ids * 37).astype(_U32) + f2u32(t * 1859.1467)
    _, _, pz, pw = rand_float4(table_t, seed_pos)
    mc_normal = normalize(rand_xyz(table_t, seed_nrm))
    px = pix_x + pz  # subpixel jitter (renderer.cl:473)
    py = pix_y + pw
    # DOF: eyePos += mcNormal.zxy * dof (renderer.cl:474)
    eye = V3(
        opts.eyePos[0] + mc_normal.z * opts.dof,
        opts.eyePos[1] + mc_normal.x * opts.dof,
        opts.eyePos[2] + mc_normal.y * opts.dof,
    )
    return {"px": px, "py": py, "mc_normal": mc_normal, "eye_pos": eye}


def light_seed(opts, px, py):
    """Jittered light-position seed (reference: renderer.cl:267) — shared by
    all lights of a pixel (no dependence on the light index)."""
    return f2u32(px * 1957.0 + py * 2173.0 + opts.time * 4763.742)


def ao_seed(opts, pos: V3):
    """AO scatter seed from world position (reference: renderer.cl:334)."""
    return f2u32(
        pos.x * 3183.75 + pos.y * 1831.42 + pos.z * 2945.87 + opts.time * 2671.918
    )
