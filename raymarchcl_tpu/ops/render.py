"""Render pipeline: spp accumulation, tonemapping, ARGB packing.

Parity with reference: the RenderImage kernel's progressive blend
(renderer.cl:478-494, `pixels = mix(pixels, col*exposure, frameBlend)` over
`iter` sequential passes with decorrelated time seeds, core.clj:82-90) and
the TonemapImage kernel (renderer.cl:496-508).

Note the reference's accumulation is an exponentially-weighted blend with
frameBlend = 1/iter starting from a zeroed buffer — NOT an arithmetic mean;
pass i carries weight (1/iter)*(1-1/iter)^(iter-1-i). We reproduce it with a
`lax.scan` over passes so the whole multi-spp frame is one compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .camera import camera_ray_lookat
from .sampling import init_render_state
from .shade import scene_color

_F32 = jnp.float32

# Per-pass time step (reference: core.clj:105 init path uses 0.333;
# the anim update path uses 0.3333, core.clj:116).
TIME_STEP_INIT = 0.333
TIME_STEP_ANIM = 0.3333


def render_pass(vol, opts, mc_table, accum, ids=None, accel=None):
    """One full-supersample pass blended into the accumulation buffer
    (reference: renderer.cl:478-494). accum: (N, 3) float32.

    ids: optional (N,) int32 GLOBAL flat pixel ids — pixel identity drives
    the jitter seeds (renderer.cl:471-472), so a shard rendering a tile must
    pass its global ids to stay bit-identical with an unsharded render.
    """
    from .sampling import transpose_table

    if ids is None:
        ids = jnp.arange(opts.num_pixels, dtype=jnp.int32)
    table_t = transpose_table(mc_table)
    state = init_render_state(opts, table_t, ids)
    ray_pos, ray_dir = camera_ray_lookat(opts, state)
    col = scene_color(vol, opts, table_t, state, ray_pos, ray_dir, accel)
    col = col * opts.exposure
    col_a = col.to_array()
    return accum + (col_a - accum) * opts.frameBlend


def render_accum(vol, opts, mc_tables, times, accum, ids=None, accel=None):
    """All spp passes via lax.scan (reference loop: core.clj:83-90).

    mc_tables: (iter, tableLen, 4); times: (iter,). The pass count is the
    leading axis, so spp is a runtime property of the inputs, not a retrace.
    """

    def step(acc, xs):
        t, table = xs
        return render_pass(vol, opts.replace(time=t), table, acc, ids, accel), None

    accum, _ = jax.lax.scan(step, accum, (times, mc_tables))
    return accum


def tonemap(col, g):
    """(col / (g + col))^2 — reinhard-ish with gamma()=square
    (reference: renderer.cl:448-454)."""
    c = col / (g + col)
    return c * c


def pack_argb(opts, accum):
    """Tonemap + pack to 0xAARRGGBB uint32 (reference: renderer.cl:496-508).
    accum: (N, 3) -> (N,) uint32."""
    col = tonemap(accum, opts.gamma) * 255.0
    col = jnp.clip(col, 0.0, 255.0).astype(jnp.uint32)
    return (
        jnp.uint32(0xFF000000)
        | (col[:, 0] << 16)
        | (col[:, 1] << 8)
        | col[:, 2]
    )


def render_image(vol, opts, mc_tables, times=None, accum=None, accel=None):
    """End-to-end frame: spp passes + tonemap.

    Returns (argb (H, W) uint32, accum (N, 3) float32). `accum` may be passed
    back in to continue refining (the reference's persistent p-buf,
    core.clj:194-208).
    """
    n_passes = mc_tables.shape[0]
    if times is None:
        times = (jnp.arange(n_passes, dtype=_F32) * TIME_STEP_INIT)
    if accum is None:
        accum = jnp.zeros((opts.num_pixels, 3), _F32)
    argb, accum = _render_jit(vol, opts, mc_tables, times, accum, accel)
    w, h = opts.resolution
    return np.asarray(argb).reshape(h, w), accum


@jax.jit
def _render_jit(vol, opts, mc_tables, times, accum, accel=None):
    accum = render_accum(vol, opts, mc_tables, times, accum, accel=accel)
    return pack_argb(opts, accum), accum
