"""Multi-chip rendering: shard the pixel grid over a device mesh.

The reference is strictly single-GPU (core.clj:121-123 picks one device);
its parallelism is one work-item per pixel. The TPU-native scale-out axis is
the same data parallelism lifted across chips: the flat pixel axis is sharded
over a 1-D `jax.sharding.Mesh`, the voxel volume / MC tables / options are
replicated (a 512^3 volume is 134 MB — trivially fits per-chip HBM), and the
only communication is the implicit all-gather of finished tiles on the way
out. Collectives ride ICI; there is nothing to psum.

Pixel identity drives the jitter seeds, so each shard renders with its
GLOBAL pixel ids — a tiled render is bit-identical to a single-device render
(asserted in tests/test_parallel.py on an 8-device CPU mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import render as render_mod

AXIS = "tiles"
PASS_AXIS = "passes"


def make_mesh(devices=None, n=None):
    """1-D pixel-tile mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.asarray(devices), (AXIS,))


def make_mesh2d(n_spp, n_tiles, devices=None):
    """2-D (passes, tiles) mesh: the production scale-out topology for big
    jobs — spp sharding keeps per-chip bands at full-frame granularity
    while pixel tiling bounds per-chip memory; the psum of pass shards
    rides ICI within each tile column."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_spp * n_tiles
    return Mesh(
        np.asarray(devices[: n_spp * n_tiles]).reshape(n_spp, n_tiles),
        (PASS_AXIS, AXIS),
    )


# Compiled tiled programs, keyed on (mesh, opts treedef incl. all static
# fields, padded pixel count). Dynamic opts leaves are ARGUMENTS (not
# closure captures), so repeated tiled renders — e.g. animation frames —
# reuse the compiled executable instead of retracing, and no device array
# is ever baked into a closure (see CLAUDE.md dispatch-poison gotcha).
_TILED_CACHE = {}


def _tiled_fn(mesh, opts, n_pad):
    # engine_key: flag flips must produce a fresh trace (render.engine_key)
    key = (mesh, jax.tree_util.tree_structure(opts), n_pad,
           render_mod.engine_key())
    fn = _TILED_CACHE.get(key)
    if fn is not None:
        return fn
    n_dev = mesh.devices.size
    blk = n_pad // n_dev
    n_pix = opts.num_pixels

    def shard_body(opts, vol, mc_tables, times, accum_blk, accel):
        tile = jax.lax.axis_index(AXIS)
        ids = tile * blk + jnp.arange(blk, dtype=jnp.int32)
        # padded tail lanes render pixel N-1 redundantly and are dropped
        ids = jnp.minimum(ids, n_pix - 1)
        acc = render_mod.render_accum(
            vol, opts, mc_tables, times, accum_blk, ids, accel
        )
        return acc, render_mod.pack_argb(opts, acc)

    fn = jax.jit(
        jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(AXIS), P()),
            out_specs=(P(AXIS), P(AXIS)),
            # check_vma left ON (the default): while_loop carries in
            # ops/march.py are pcast to the body's varying manual axes
            # (march._carry_vma), so the analysis passes and keeps
            # screening the body for real sharding errors.
        )
    )
    _TILED_CACHE[key] = fn
    return fn


def _spp_fn(mesh, opts, n_passes):
    key = ("spp", mesh, jax.tree_util.tree_structure(opts), n_passes,
           render_mod.engine_key())
    fn = _TILED_CACHE.get(key)
    if fn is not None:
        return fn
    n_dev = mesh.devices.size
    blk = n_passes // n_dev

    def shard_body(opts, vol, mc_tables_blk, times_blk, accum0, accel):
        from ..ops.march import _carry_vma

        k = jax.lax.axis_index(AXIS)
        # the zero start buffer must carry the shard axis' varying-manual-axes
        # (the pass scan's carry becomes varying after one step)
        zero = _carry_vma(jnp.zeros_like(accum0), mc_tables_blk)
        acc_k = render_mod.render_accum(
            vol, opts, mc_tables_blk, times_blk, zero, accel=accel
        )
        # chip k's local exponential blend from zero weights its passes
        # (fb)(1-fb)^(blk-1-j); the global blend wants exponent
        # (n_passes-1) - (k*blk+j) = (blk-1-j) + blk*(n_dev-1-k), so the
        # shard re-weights by (1-fb)^(blk*(n_dev-1-k)) before the psum.
        w = (1.0 - opts.frameBlend) ** (
            jnp.float32(blk) * (n_dev - 1 - k).astype(jnp.float32)
        )
        acc = jax.lax.psum(acc_k * w, AXIS)
        # an incoming accumulation buffer survives all n_passes blends
        acc = acc + accum0 * (1.0 - opts.frameBlend) ** jnp.float32(n_passes)
        return acc, render_mod.pack_argb(opts, acc)

    fn = jax.jit(
        jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(), P(), P(AXIS), P(AXIS), P(), P()),
            out_specs=(P(), P()),
        )
    )
    _TILED_CACHE[key] = fn
    return fn


def _fn2d(mesh, opts, n_pad, n_passes):
    key = ("2d", mesh, jax.tree_util.tree_structure(opts), n_pad, n_passes,
           render_mod.engine_key())
    fn = _TILED_CACHE.get(key)
    if fn is not None:
        return fn
    n_tiles = mesh.shape[AXIS]
    n_sp = mesh.shape[PASS_AXIS]
    blk_px = n_pad // n_tiles
    blk_p = n_passes // n_sp
    n_pix = opts.num_pixels

    def shard_body(opts, vol, mc_tables_blk, times_blk, accum_blk, accel):
        from ..ops.march import _carry_vma

        tile = jax.lax.axis_index(AXIS)
        k = jax.lax.axis_index(PASS_AXIS)
        ids = tile * blk_px + jnp.arange(blk_px, dtype=jnp.int32)
        ids = jnp.minimum(ids, n_pix - 1)  # padded tail: redundant pixel
        zero = _carry_vma(jnp.zeros_like(accum_blk), mc_tables_blk)
        acc_k = render_mod.render_accum(
            vol, opts, mc_tables_blk, times_blk, zero, ids, accel
        )
        # same closed-form re-weighting as _spp_fn, psummed down the pass
        # columns of this tile
        w = (1.0 - opts.frameBlend) ** (
            jnp.float32(blk_p) * (n_sp - 1 - k).astype(jnp.float32)
        )
        acc = jax.lax.psum(acc_k * w, PASS_AXIS)
        acc = acc + accum_blk * (1.0 - opts.frameBlend) ** jnp.float32(n_passes)
        return acc, render_mod.pack_argb(opts, acc)

    fn = jax.jit(
        jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(), P(), P(PASS_AXIS), P(PASS_AXIS), P(AXIS), P()),
            out_specs=(P(AXIS), P(AXIS)),
        )
    )
    _TILED_CACHE[key] = fn
    return fn


def render_image_2d(vol, opts, mc_tables, times=None, accum=None, mesh=None,
                    accel=None):
    """Combined pass x pixel sharding over a 2-D (passes, tiles) mesh
    (make_mesh2d): chip (k, t) renders passes [k*blk_p, (k+1)*blk_p) of
    pixel tile t from a zero buffer; the closed-form re-weighted blends
    psum down each tile's pass column (exact weights, f32 reassociation —
    same tolerance story as render_image_spp_sharded).

    Returns (argb (H, W) ndarray, accum (n_pad, 3) tile-sharded array for
    progressive refinement)."""
    if mesh is None:
        n_dev = len(jax.devices())
        if n_dev < 2:
            raise ValueError("render_image_2d needs >= 2 devices")
        mesh = make_mesh2d(2, n_dev // 2)
    n_sp = mesh.shape[PASS_AXIS]
    n_tiles = mesh.shape[AXIS]
    n_passes = mc_tables.shape[0]
    if n_passes % n_sp != 0:
        raise ValueError(
            f"2-D sharding needs n_passes ({n_passes}) divisible by the"
            f" mesh pass dim ({n_sp})"
        )
    if times is None:
        times = jnp.arange(n_passes, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    n_pix = opts.num_pixels
    n_pad = -(-n_pix // n_tiles) * n_tiles
    if accum is None:
        accum = jnp.zeros((n_pad, 3), jnp.float32)
    accum = jax.device_put(accum, NamedSharding(mesh, P(AXIS)))
    vol = jax.device_put(
        jnp.asarray(vol, jnp.uint8).reshape(-1), NamedSharding(mesh, P())
    )
    shard_p = NamedSharding(mesh, P(PASS_AXIS))
    mc_tables = jax.device_put(mc_tables, shard_p)
    times = jax.device_put(times, shard_p)
    fn = _fn2d(mesh, opts, n_pad, n_passes)
    accum, argb = fn(opts, vol, mc_tables, times, accum, accel)
    w, h = opts.resolution
    return np.asarray(argb)[:n_pix].reshape(h, w), accum


def render_image_spp_sharded(vol, opts, mc_tables, times=None, accum=None,
                             mesh=None, accel=None):
    """Shard the PASS (spp) axis over the mesh (reference pass loop:
    core.clj:82-90) — the other embarrassingly-parallel axis, complementary
    to pixel tiling: at high chip counts pixel tiles shrink until band
    scheduling loses granularity, while pass sharding keeps each chip's
    per-pass working set at the full frame.

    Exactness: the accumulation is an exponentially-weighted blend with
    KNOWN weights — pass i of n carries (1/n)*(1-1/n)^(n-1-i)
    (ops/render.py module docstring) — i.e. a linear combination. Chip k
    renders passes [k*blk, (k+1)*blk) from a zero buffer and re-weights its
    local blend by (1-1/n)^(blk*(n_dev-1-k)); the psum of the re-weighted
    shards equals the sequential blend exactly in real arithmetic. In f32
    the reassociation moves last ULPs (the sequential blend is a different
    evaluation order), so parity with render_image is tolerance-tested, not
    bit-tested (tests/test_parallel.py::test_spp_sharded_matches_sequential).

    Requires n_passes % n_devices == 0. Per-ray math is unchanged: pass
    identity enters only through `times` and the per-pass MC table, both of
    which shard along the pass axis.

    Returns (argb (H, W) uint32 ndarray, accum (N, 3) float32 — replicated,
    feed back in for progressive refinement).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n_passes = mc_tables.shape[0]
    if n_passes % n_dev != 0:
        raise ValueError(
            f"spp sharding needs n_passes ({n_passes}) divisible by the mesh"
            f" size ({n_dev}); pad the pass axis or use pixel tiling"
        )
    if times is None:
        times = jnp.arange(n_passes, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    if accum is None:
        accum = jnp.zeros((opts.num_pixels, 3), jnp.float32)
    rep = NamedSharding(mesh, P())
    accum = jax.device_put(accum, rep)
    vol = jax.device_put(jnp.asarray(vol, jnp.uint8).reshape(-1), rep)
    shard = NamedSharding(mesh, P(AXIS))
    mc_tables = jax.device_put(mc_tables, shard)
    times = jax.device_put(times, shard)
    fn = _spp_fn(mesh, opts, n_passes)
    accum, argb = fn(opts, vol, mc_tables, times, accum, accel)
    w, h = opts.resolution
    return np.asarray(argb).reshape(h, w), accum


def render_image_tiled(vol, opts, mc_tables, times=None, accum=None, mesh=None, accel=None):
    """Drop-in tiled equivalent of ops.render.render_image.

    Returns (argb (H, W) uint32 ndarray, accum (n_pad, 3) sharded array that
    can be fed back in for progressive refinement).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n_passes = mc_tables.shape[0]
    if times is None:
        times = jnp.arange(n_passes, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    n_pix = opts.num_pixels
    n_pad = -(-n_pix // n_dev) * n_dev
    if accum is None:
        accum = jnp.zeros((n_pad, 3), jnp.float32)
    accum = jax.device_put(accum, NamedSharding(mesh, P(AXIS)))
    vol = jax.device_put(jnp.asarray(vol, jnp.uint8).reshape(-1), NamedSharding(mesh, P()))
    fn = _tiled_fn(mesh, opts, n_pad)
    accum, argb = fn(opts, vol, mc_tables, times, accum, accel)
    w, h = opts.resolution
    argb_host = np.asarray(argb)[:n_pix].reshape(h, w)
    return argb_host, accum
