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


# Screen bands rendered sequentially per pass (lax.scan). Lock-step masked
# marching costs the worst ray per round across ALL lanes in flight; rays in
# a horizontal band are coherent (sky bands exit immediately, geometry bands
# share march depth), so scanning bands trades no accuracy (per-ray math is
# identical => bit-equal on TPU) for a large cut in wasted gather lanes.
# Band size: 1024 was the round-1 optimum PRE-cost-sorting; the round-3
# sweep under the sorted regime (scripts/bench_tileray_sweep.py, 512^2/4spp
# ao, v5e) measured 512: 2.93s, 1024: 2.25s, 2048: 1.97s, 4096: 1.97s,
# 8192: 2.00s, 16384: 2.23s. The 4-spp sweep ties 2048/4096, but at the
# full 16-spp headline the decaying-max predictor has more history and
# bigger sorted bands win outright: 2048: 7.06s, 4096: 6.79s, 8192: 7.05s
# (A/B, same protocol as bench.py, v5e) — hence 4096.
TILE_RAYS = 4096
MAX_TILES = 256


def auto_tiles(n):
    """Largest power-of-two band count dividing n with bands >= TILE_RAYS."""
    t = 1
    while t < MAX_TILES and n % (t * 2) == 0 and n // (t * 2) >= TILE_RAYS:
        t *= 2
    return t


def render_pass(vol, opts, mc_table, accum, ids=None, accel=None, tiles=None,
                prev_cost=None):
    """One full-supersample pass blended into the accumulation buffer
    (reference: renderer.cl:478-494). accum: (N, 3) float32.

    ids: optional (N,) int32 GLOBAL flat pixel ids — pixel identity drives
    the jitter seeds (renderer.cl:471-472), so a shard rendering a tile must
    pass its global ids to stay bit-identical with an unsharded render.

    prev_cost: optional previous-pass cost maps ({'a','b'} per-pixel int32)
    enabling cost-sorted bands — the pass then returns (accum, new_cost)
    instead of accum (see _render_pass_deferred).
    """
    from .sampling import transpose_table

    if ids is None:
        ids = jnp.arange(opts.num_pixels, dtype=jnp.int32)
    n = ids.shape[0]
    if tiles is None:
        tiles = auto_tiles(n)
    while tiles > 1 and (n % tiles != 0 or n // tiles < 512):
        tiles //= 2
    table_t = transpose_table(mc_table)

    def shade_ids(ids_t, accum_t):
        state = init_render_state(opts, table_t, ids_t)
        ray_pos, ray_dir = camera_ray_lookat(opts, state)
        col = scene_color(vol, opts, table_t, state, ray_pos, ray_dir, accel)
        col_a = (col * opts.exposure).to_array()
        return accum_t + (col_a - accum_t) * opts.frameBlend

    if tiles > 1 and DEFERRED_SHADE:
        return _render_pass_deferred(
            vol, opts, table_t, accum, ids, accel, tiles, prev_cost=prev_cost
        )
    if prev_cost is not None:  # non-deferred paths track no cost
        return render_pass(vol, opts, mc_table, accum, ids, accel, tiles), prev_cost
    if tiles <= 1:
        return shade_ids(ids, accum)
    nt = n // tiles
    _, acc = jax.lax.scan(
        lambda _, xs: (None, shade_ids(xs[0], xs[1])),
        None,
        (ids.reshape(tiles, nt), accum.reshape(tiles, nt, 3)),
    )
    return acc.reshape(n, 3)


# Deferred shading: split each pass into a march phase (screen bands) and a
# shade phase (incl. reflection bounces) over rays PERMUTED by hit-position
# Morton code. Shadow/AO/bounce march rounds cost each band's worst ray;
# spatially-coherent surface points share occlusion paths, so sorted bands
# converge together. Per-ray math is identical — output is bit-equal ON TPU
# (grouping only changes loop round counts, never values). On XLA:CPU the
# band scan contracts FMAs differently from the monolithic program, so
# last-ULP/threshold pixels can differ from the tiles=1 path there (see
# tests/test_parallel.py); set False if exact CPU reproducibility matters.
DEFERRED_SHADE = True

# Active-lane compaction for the secondary loops of REFLECTIVE presets
# (shade.shade_after_march_compact): stable-partition each bounce-march /
# shadow / AO while_loop's lanes so actives pack into the leading bands and
# all-inactive bands exit immediately. Motivated by the config-4 audit
# (scripts/audit_config4.py): bounce-phase loops pay 34-132x their useful
# applications because 3-17% active sets are smeared over every band;
# offline reconstruction predicts paid secondary apps 70.4M -> 38.1M/pass
# (1.85x) at 256^2 metal. Grouping-only => bit-equal on TPU (CPU tolerance:
# FMA contraction, like every banding invariant).
# Trace-time constant — clear the render jit cache when flipping.
COMPACT_SECONDARY = True

# Per-LOOP history keys for the compacted secondary loops (reflective
# presets): the spp scan additionally carries each bounce-march / shadow
# loop's per-pixel applications (shade.compact_loop_names), and each loop's
# active lanes are ordered inside the compaction by its own 5x5-max-filtered
# history | loop-origin Morton (shade._loop_key). Offline oracle
# (audit_config4 --study-keys, 256^2 metal): paid secondary apps 38.6M ->
# 20.0M at 1024-row keyed bands. Grouping-only => bit-equal on TPU.
# Trace-time constant — clear the render jit cache when flipping.
LOOP_KEYS = True


# Pass-stacking: render PASS_STACK spp passes of the same pixel band as ONE
# program whose march/shade carries are literally (N, P) with the pass axis
# P MINOR (trailing) — lane (i, p) runs pass p of pixel i with its own
# seeds/jitters/table block threaded through every seed site
# (sampling.init_render_state / _table_idx), then the per-pass colors blend
# sequentially in pass order, so values are identical to the sequential
# scan by construction (BIT-EQUAL on TPU; CPU gets the usual
# FMA-contraction tolerance). Within a stacked group all P passes share the
# group-entry cost maps and band permutation (scheduling-only difference).
#
# Why trailing: a while-body's TRAILING axis carries W independent lanes at
# 0.88-1.37x the 1-D cost (2.3-2.9x throughput/Klane) while LEADING growth
# is near-linear (scripts/bench_width_scaling.py, PERFORMANCE.md round-3
# session-5). A vmap prototype of this same blend/cost plumbing was
# measured SLOWER (P=4: 5.30 s vs 4.70) because vmap batches every
# intermediate at dim 0 — the layout is the whole lever, hence the manual
# (N, P) engine (ops/march.py lane-shape-generic carries).
#
# Engages on the deferred+accel path for bounce-free presets (reflective
# presets keep COMPACT_SECONDARY's lane compaction, which is (N,)-shaped).
# The effective stack is the largest divisor of the pass count <= this
# value (25 spp at 8 -> groups of 5); an A/B that needs an exact P should
# assert divisibility itself (scripts/bench_pass_stack.py does). Under
# spp sharding (parallel/tiling.py) each shard sees its LOCAL pass count
# (16 spp / 8 chips = 2 passes/shard -> P=2 groups per shard) — the
# divisor rule applies per shard, so unequal shard pass counts can stack
# differently; tiling.py keeps shard pass counts equal by construction.
# Trace-time constant; hashes into the jit key via engine_key().
#
# HW A/B (v5e, headline 512^2/16spp ao, bit-equal on device at every
# point): P=1 4.87 s; at TILE_RAYS=4096 rows P=2 5.35 / P=4 4.46 / P=8
# 4.05 / P=16 4.72 (one group = no cost sort — the sorted second group is
# worth more than wider stacking); band re-sweep at P=8: 2048 rows 3.79,
# 1024 rows 3.56, 512 rows (=1024 via MAX_TILES) 3.63. Default P=8 with
# STACK_TILE_ROWS=1024: 4.87 -> 3.56 s (-27%). Model correction recorded
# in PERFORMANCE.md: the win is bounded by the non-gather op share (the
# headline runs near the row-gather floor, which is linear in lanes), not
# the 2-2.5x the pure op-count projection promised.
PASS_STACK = 8  # passes per stacked group (1 = off)

# Band ROWS per stacked band (the trailing axis multiplies lanes/band by
# P, so the row optimum sits below TILE_RAYS; 1024 rows x P=8 = 8192
# lanes/band, consistent with the unstacked 4096-8192-lane optimum).
STACK_TILE_ROWS = 1024

# Pass-stacking for REFLECTIVE presets with per-LANE pooled compaction:
# the group's (N, P) lanes flatten to (N*P,) for the compacted secondary
# loops, so each lane packs by its OWN active flag (the round-4
# row-granularity attempt paid the union of the P active sets and
# regressed 33%). Offline replay at config-4 spec
# (scripts/study_lane_stack_cfg4.py): paid secondary apps 890.6M
# (production unstacked) -> 682.0M pooled (row-stacked reference: 910.2M).
# Requires COMPACT_SECONDARY. Trace-time constant; hashes via engine_key.
STACK_REFLECTIVE = True

# Pooled-lane budget for STACK_REFLECTIVE: the reflective stacked phase B
# materializes (N*P)-lane packed matrices; at 1024^2 x P=8 the program
# needed 18.04G of the v5e's 15.75G HBM (measured OOM, config-5 100-spp
# driver). 1024^2 x P=4 (4.2M lanes) fits with room; cap at 5M lanes so
# big frames stack at the largest P that fits (1024^2 -> P=4; 512^2
# keeps P=8; sharded frames see per-shard N and keep full P).
STACK_REFLECTIVE_MAX_LANES = 5_000_000

# Prepass seeding for STACKED reflective groups (a/b maps + per-loop
# histories). Measured OFF: the hypothesis was that group 0 being 1/2 of
# a 16-spp stacked frame (vs 1/16 unstacked, where the prepass was a
# wash) would make the seed pay — it didn't. Config-4 spec A/B on v5e:
# off 17.137 s / on 17.978 s, bit-equal (the 16K-lane probe runs the
# full compacted-loop machinery; its fixed costs exceed the cold-start
# saving at every stride). Trace-time constant; hashes via engine_key.
PREPASS_REFLECTIVE = False

# Cost-map PREPASS for the stacked engine's group-0 cold start: before the
# group scan, render ONE instrumented pass over every STRIDE-th pixel in
# both axes (1/STRIDE^2 of the lanes, pass-0 table) and seed the scan's
# initial cost maps with its app maps, max-FILTered at the coarse grid
# (k=PREPASS_FILT) and nearest-upsampled. The round-5 group split showed
# group 0 (Morton-only sort) paying 140.1M vs group 1's 88.2M at spec;
# offline replay (scripts/study_group0_key.py) prices this seed at paid
# march 174.7M -> ~103M and paid shade 228.4M -> ~218M (stride 4, filt 3)
# for a ~2M-app prepass. The coarse max filter is load-bearing: RAW point
# samples measured WORSE than no history (a band whose key missed its
# worst pixel blows the band max); max-filtering trades resolution for
# conservatism. Prepass color is discarded — scheduling-only, bit-equal.
# Trace-time constants; hash into the jit key via engine_key().
PREPASS_STRIDE = 4  # 0/1 = off
PREPASS_FILT = 3


# Morton key (moved to vecmath so shade.py's per-loop compaction keys can
# share it; kept under the old name for the audit/bench scripts).
from .vecmath import morton10 as _morton10  # noqa: E402


def _maxfilt2d(cost, w, k):
    """k x k maximum filter over the row-major (n//w, w) pixel grid
    (edge-clamped). Identity when the flat block isn't row-aligned (odd
    shard paddings) — the sort then falls back to the raw signal."""
    n = cost.shape[0]
    if w <= 0 or n % w != 0 or n // w < 2:
        return cost
    a = cost.reshape(n // w, w)
    r = k // 2
    pad = jnp.pad(a, ((r, r), (r, r)), mode="edge")
    out = a
    for dy in range(k):
        for dx in range(k):
            out = jnp.maximum(out, pad[dy : dy + a.shape[0], dx : dx + a.shape[1]])
    return out.reshape(-1)


def _render_pass_deferred(vol, opts, table_t, accum, ids, accel, tiles,
                          prev_cost=None):
    """Deferred pass; with `prev_cost` ({'a','b'}: per-pixel march/shade
    applications of the PREVIOUS pass) bands are COST-SORTED:

    * phase A bands by a 3x3-max filter of the previous pass's primary
      march applications (the filter absorbs per-pass jitter noise:
      measured overhead over useful work 3.6x -> 1.5x on v5e);
    * phase B bands by a 5x5-max filter of the previous pass's secondary
      (shadow + bounce) applications, with the hit-position Morton code as
      the tiebreak (5.3x unsorted / 3.8x Morton -> 2.5x);
    * on the compacted reflective path, prev_cost may carry a 'loops'
      sub-dict of PER-LOOP application maps (see shade.compact_loop_names);
      each secondary loop's active lanes are then additionally ordered by
      its own 5x5-max-filtered history inside the compaction, and new_cost
      returns this pass's per-loop maps (audit_config4 --study-keys: paid
      secondary apps 38.6M -> 20.0M at 256^2 metal);

    and the pass additionally returns this pass's cost maps. Sorting is
    grouping-only — per-ray math is unchanged, output bit-equal on TPU
    (scripts/tpu_invariants.py)."""
    from .march import raymarch
    from .shade import shade_after_march
    from .vecmath import V3

    n = ids.shape[0]
    nt = n // tiles
    w = opts.resolution[0]
    stats = prev_cost is not None

    if stats:
        order_a = jnp.argsort(_maxfilt2d(prev_cost["a"], w, 3), stable=True)
        ids = jnp.take(ids, order_a)

    # --- phase A: per-band primary march -------------------------------
    def march_band(_, ids_t):
        state = init_render_state(opts, table_t, ids_t)
        ray_pos, ray_dir = camera_ray_lookat(opts, state)
        act = jnp.ones((ids_t.shape[0],), bool)
        isec = raymarch(
            vol, opts, ray_pos, ray_dir, opts.maxDist, opts.maxIter,
            smooth=True, active=act, want_normal=True, accel=accel,
            want_stats=stats,
        )
        out = (state["px"], state["py"], state["mc_normal"],
               ray_pos, ray_dir, isec["pos"], isec["distance"],
               isec["object_id"], isec["normal"])
        if stats:
            out = out + (isec["apps"],)
        return None, out
    _, out = jax.lax.scan(march_band, None, ids.reshape(tiles, nt))
    out = jax.tree_util.tree_map(lambda a: a.reshape((n,) + a.shape[2:]), out)
    if stats:
        (px, py, mcn, rpos, rdir, ipos, idist, iobj, inorm, apps_a) = out
    else:
        (px, py, mcn, rpos, rdir, ipos, idist, iobj, inorm) = out

    # --- permutation: shade cost bucket (when known), Morton tiebreak ---
    hit = idist < opts.maxDist
    scale = jnp.float32(1023.0 / 4.0)
    qk = lambda c: jnp.clip((c + 2.0) * scale, 0.0, 1023.0).astype(jnp.int32)
    morton = _morton10(qk(ipos.x), qk(ipos.y), qk(ipos.z))
    if stats:
        cost_b = jnp.take(_maxfilt2d(prev_cost["b"], w, 5), order_a)
        key_hit = (jnp.clip(cost_b, 0, 4095) << 14) | (morton >> 16)
    else:
        key_hit = morton
    key = jnp.where(
        hit, key_hit,
        jnp.int32(2**30) + jnp.arange(n, dtype=jnp.int32),  # misses: stable tail
    )
    perm = jnp.argsort(key, stable=True)
    pick = lambda a: jnp.take(a, perm, axis=0)
    pick3 = lambda v: V3(pick(v.x), pick(v.y), pick(v.z))
    px, py = pick(px), pick(py)
    mcn, rpos, rdir, ipos, inorm = (
        pick3(mcn), pick3(rpos), pick3(rdir), pick3(ipos), pick3(inorm)
    )
    idist, iobj = pick(idist), pick(iobj)

    # --- phase B: per-band shading (scene_color minus the primary march,
    # incl. the bounce loop for reflective presets) ----------------------
    loop_apps = None
    if COMPACT_SECONDARY and opts.reflectIter > 0:
        from .shade import shade_after_march_compact

        isec_d = {"pos": ipos, "distance": idist, "object_id": iobj,
                  "normal": inorm}
        prev_loops = prev_cost.get("loops") if stats else None
        pl = None
        if prev_loops is not None:
            # per-loop history to caller lane order: filter in pixel-grid
            # order, then ride the same two permutations as the lanes
            pl = {nm: jnp.take(jnp.take(_maxfilt2d(v, w, 5), order_a), perm)
                  for nm, v in prev_loops.items()}
        ret = shade_after_march_compact(
            vol, opts, table_t, tiles, px, py, mcn, rpos, rdir, isec_d,
            accel, want_stats=stats, prev_loops=pl,
        )
        if stats and pl is not None:
            col, apps_b, loop_apps = ret
        elif stats:
            col, apps_b = ret
        else:
            col = ret
    else:
        def shade_band(_, xs):
            (px, py, mcn, rpos, rdir, ipos, idist, iobj, inorm) = xs
            isec = {"pos": ipos, "distance": idist, "object_id": iobj,
                    "normal": inorm}
            return None, shade_after_march(
                vol, opts, table_t, px, py, mcn, rpos, rdir, isec, accel,
                want_stats=stats,
            )

        xs = jax.tree_util.tree_map(
            lambda a: a.reshape((tiles, nt) + a.shape[1:]),
            (px, py, mcn, rpos, rdir, ipos, idist, iobj, inorm),
        )
        _, col = jax.lax.scan(shade_band, None, xs)
        if stats:
            col, apps_b = col
            apps_b = apps_b.reshape(n)
        col = jax.tree_util.tree_map(lambda a: a.reshape(n), col)

    # --- unsort + blend -------------------------------------------------
    col_a = (col * opts.exposure).to_array()
    if stats:
        perm_total = jnp.take(order_a, perm)
        col_unsorted = jnp.zeros_like(col_a).at[perm_total].set(col_a)
        new_cost = {
            "a": jnp.zeros((n,), jnp.int32).at[order_a].set(apps_a),
            "b": jnp.zeros((n,), jnp.int32).at[perm_total].set(apps_b),
        }
        if loop_apps is not None:
            new_cost["loops"] = {
                nm: jnp.zeros((n,), jnp.int32).at[perm_total].set(v)
                for nm, v in loop_apps.items()
            }
        elif "loops" in prev_cost:  # carry structure if a non-compact
            new_cost["loops"] = prev_cost["loops"]  # path was configured
        return accum + (col_unsorted - accum) * opts.frameBlend, new_cost
    col_unsorted = jnp.zeros_like(col_a).at[perm].set(col_a)
    return accum + (col_unsorted - accum) * opts.frameBlend


def _render_pass_deferred_stacked(vol, opts, table_t, times, accum, ids,
                                  accel, tiles, prev_cost):
    """PASS_STACK deferred passes as ONE program whose march/shade lanes are
    (N, P) with the pass axis trailing (see the PASS_STACK comment).

    times: (P,) pass times; table_t: (4, P*L) stacked table
    (sampling.transpose_table_stacked); prev_cost: per-PIXEL cost maps
    shared by the whole group. Returns (accum', new_cost).

    The P passes share the group-entry band sort — phase A by the previous
    group's a-cost, phase B by its b-cost with the group's any-pass hit and
    pass 0's hit-position Morton code as tiebreak. Permutations act on
    (N, P) ROWS (one packed row gather each), so all P lanes of a pixel
    ride in the pixel's band. Per-lane march/shade values are bit-identical
    to the sequential per-pass renders (lanes are independent and every
    seed site threads the lane's own pass time/table block); the final
    blend applies the per-pass colors in pass order, reproducing the
    reference's exponential accumulation exactly (renderer.cl:478-494)."""
    from .march import raymarch
    from .shade import shade_after_march
    from .vecmath import V3

    n = ids.shape[0]
    p = times.shape[0]
    nt = n // tiles
    w = opts.resolution[0]
    opts_s = opts.replace(time=times)  # (P,) time row -> stacked lane state

    order_a = jnp.argsort(_maxfilt2d(prev_cost["a"], w, 3), stable=True)
    ids = jnp.take(ids, order_a)

    # --- phase A: per-band primary march, (nt, P) trailing lanes ---------
    def march_band(_, ids_t):
        state = init_render_state(opts_s, table_t, ids_t)
        ray_pos, ray_dir = camera_ray_lookat(opts_s, state)
        act = jnp.ones((ids_t.shape[0], p), bool)
        isec = raymarch(
            vol, opts_s, ray_pos, ray_dir, opts_s.maxDist, opts_s.maxIter,
            smooth=True, active=act, want_normal=True, accel=accel,
            want_stats=True,
        )
        return None, (state["px"], state["py"], state["mc_normal"],
                      ray_pos, ray_dir, isec["pos"], isec["distance"],
                      isec["object_id"], isec["normal"], isec["apps"])

    _, out = jax.lax.scan(march_band, None, ids.reshape(tiles, nt))
    out = jax.tree_util.tree_map(lambda a: a.reshape((n,) + a.shape[2:]), out)
    (px, py, mcn, rpos, rdir, ipos, idist, iobj, inorm, apps_a) = out

    # --- group permutation: one per-PIXEL key shared by the P lanes ------
    hit = jnp.any(idist < opts.maxDist, axis=1)  # any pass hit
    scale = jnp.float32(1023.0 / 4.0)
    qk = lambda c: jnp.clip((c + 2.0) * scale, 0.0, 1023.0).astype(jnp.int32)
    # Morton tiebreak from pass 0's hit position (passes of a pixel
    # correlate at ~0.89; rows whose pass 0 missed get a clipped far
    # position — scheduling noise only, the cost bucket dominates the key)
    morton = _morton10(qk(ipos.x[:, 0]), qk(ipos.y[:, 0]), qk(ipos.z[:, 0]))
    cost_b = jnp.take(_maxfilt2d(prev_cost["b"], w, 5), order_a)
    key_hit = (jnp.clip(cost_b, 0, 4095) << 14) | (morton >> 16)
    key = jnp.where(
        hit, key_hit,
        jnp.int32(2**30) + jnp.arange(n, dtype=jnp.int32),  # misses: tail
    )
    perm = jnp.argsort(key, stable=True)
    pick = lambda a: jnp.take(a, perm, axis=0)
    pick3 = lambda v: V3(pick(v.x), pick(v.y), pick(v.z))
    px, py = pick(px), pick(py)
    mcn, rpos, rdir, ipos, inorm = (
        pick3(mcn), pick3(rpos), pick3(rdir), pick3(ipos), pick3(inorm)
    )
    idist, iobj = pick(idist), pick(iobj)

    # --- phase B ----------------------------------------------------------
    loop_apps = None
    if COMPACT_SECONDARY and opts.reflectIter > 0:
        # Reflective presets: POOL the group's (n, P) lanes to (n*P,) and
        # run the per-lane compacted secondary loops over them — each lane
        # packs by its OWN active flag, so the round-4 row-granularity
        # union dilution (a row stayed in a loop while ANY of its P lanes
        # was active; P=8 measured 31.6 s vs P=1 23.75 at config 4) is
        # gone, and actives from P passes pool into fuller bands. Offline
        # replay at spec (scripts/study_lane_stack_cfg4.py, 512^2 metal
        # 16 spp): paid secondary apps 890.6M unstacked / 910.2M
        # row-stacked / 682.0M per-lane pooled. Lane pass identity rides
        # as per-lane opts.time rows + explicit table-block offsets
        # (sampling._table_idx block=): per-lane values are bit-identical
        # to the sequential per-pass renders.
        from ..options import MC_TABLE_LENGTH
        from .shade import shade_after_march_compact

        nl = n * p
        flat = lambda a: a.reshape((nl,) + a.shape[2:])
        flat3 = lambda v: V3(flat(v.x), flat(v.y), flat(v.z))
        time_l = jnp.broadcast_to(times[None, :], (n, p)).reshape(-1)
        tb = jnp.broadcast_to(
            (jnp.arange(p, dtype=jnp.int32) * MC_TABLE_LENGTH)[None, :],
            (n, p)).reshape(-1)
        isec_d = {"pos": flat3(ipos), "distance": flat(idist),
                  "object_id": flat(iobj), "normal": flat3(inorm)}
        pl = None
        prev_loops = prev_cost.get("loops")
        if prev_loops is not None:
            # per-PIXEL loop history -> caller lane order -> broadcast to
            # the pixel's P pooled lanes
            pl = {nm: jnp.broadcast_to(
                jnp.take(jnp.take(_maxfilt2d(v, w, 5), order_a), perm)[:, None],
                (n, p)).reshape(-1)
                for nm, v in prev_loops.items()}
        tiles_ao = 1
        while (nl % (tiles_ao * 2) == 0
               and nl // (tiles_ao * 2) >= TILE_RAYS):
            tiles_ao *= 2
        ret = shade_after_march_compact(
            vol, opts.replace(time=time_l), table_t, tiles_ao, flat(px),
            flat(py), flat3(mcn), flat3(rpos), flat3(rdir), isec_d, accel,
            want_stats=True, prev_loops=pl, tblock=tb,
        )
        if pl is not None:
            col_f, apps_f, loop_apps = ret
        else:
            col_f, apps_f = ret
        col = V3(col_f.x.reshape(n, p), col_f.y.reshape(n, p),
                 col_f.z.reshape(n, p))
        apps_b = apps_f.reshape(n, p)
    else:
        # bounce-free: per-band shading over (nt, P) lanes
        def shade_band(_, xs):
            (px, py, mcn, rpos, rdir, ipos, idist, iobj, inorm) = xs
            isec = {"pos": ipos, "distance": idist, "object_id": iobj,
                    "normal": inorm}
            return None, shade_after_march(
                vol, opts_s, table_t, px, py, mcn, rpos, rdir, isec, accel,
                want_stats=True,
            )

        xs = jax.tree_util.tree_map(
            lambda a: a.reshape((tiles, nt) + a.shape[1:]),
            (px, py, mcn, rpos, rdir, ipos, idist, iobj, inorm),
        )
        _, (col, apps_b) = jax.lax.scan(shade_band, None, xs)
        col = jax.tree_util.tree_map(lambda a: a.reshape(n, p), col)
        apps_b = apps_b.reshape(n, p)

    # --- unsort + sequential blend in pass order --------------------------
    col_a = (col * opts.exposure).to_array()  # (n, p, 3)
    perm_total = jnp.take(order_a, perm)
    col_u = jnp.zeros_like(col_a).at[perm_total].set(col_a)
    # the group's cost signal: worst pass per pixel (the band charges its
    # worst lane, and all P lanes of a pixel share a band row)
    new_cost = {
        "a": jnp.zeros((n,), jnp.int32).at[order_a].set(
            jnp.max(apps_a, axis=1)),
        "b": jnp.zeros((n,), jnp.int32).at[perm_total].set(
            jnp.max(apps_b, axis=1)),
    }
    if loop_apps is not None:
        new_cost["loops"] = {
            nm: jnp.zeros((n,), jnp.int32).at[perm_total].set(
                jnp.max(v.reshape(n, p), axis=1))
            for nm, v in loop_apps.items()
        }
    elif prev_cost.get("loops") is not None:
        new_cost["loops"] = prev_cost["loops"]  # carry structure
    for i in range(p):
        accum = accum + (col_u[:, i, :] - accum) * opts.frameBlend
    return accum, new_cost


def _prepass_cost(vol, opts, table_t, ids_m, accel, n, w, loops=None):
    """Strided instrumented prepass -> upsampled {'a','b'} cost maps (see
    PREPASS_STRIDE). With `loops` (static name list, reflective presets)
    the returned dict additionally carries upsampled per-LOOP maps under
    'loops' (shade.compact_loop_names). Returns None when the lane block
    is not a whole number of STRIDE-aligned pixel rows (odd shard
    paddings) — callers fall back to the zero seed."""
    f = PREPASS_STRIDE
    if f <= 1 or w <= 0 or n % w != 0 or w % f != 0:
        return None
    rows = n // w
    if rows % f != 0 or (rows // f) * (w // f) < 1024:
        return None
    ids_pre = ids_m.reshape(rows, w)[::f, ::f].reshape(-1)
    n_pre = ids_pre.shape[0]
    tiles_pre = 1
    while n_pre % (tiles_pre * 2) == 0 and n_pre // (tiles_pre * 2) >= 4096:
        tiles_pre *= 2
    zero = jnp.zeros((n_pre,), jnp.int32)
    prev = {"a": zero, "b": zero}
    if loops is not None:
        prev["loops"] = {nm: zero for nm in loops}
    _, cost = _render_pass_deferred(
        vol, opts, table_t, jnp.zeros((n_pre, 3), jnp.float32), ids_pre,
        accel, tiles_pre, prev_cost=prev,
    )

    def up(c):
        c = _maxfilt2d(c, w // f, PREPASS_FILT)
        c = c.reshape(rows // f, w // f)
        return jnp.repeat(jnp.repeat(c, f, axis=0), f, axis=1).reshape(-1)

    out = {"a": up(cost["a"]), "b": up(cost["b"])}
    if loops is not None:
        out["loops"] = {nm: up(v) for nm, v in cost["loops"].items()}
    return out


def stack_p(n, n_passes, reflective):
    """Effective stack width P for an n-pixel frame of n_passes passes.

    Full PASS_STACK groups are preferred; a clean divisor is taken only
    when it is near PASS_STACK (the measured P-curve plateaus at P=6-8 and
    drops sharply below — round-4 sweep), the remainder runs as an
    unstacked tail. Reflective presets additionally clamp P to the pooled
    phase-B HBM budget (STACK_REFLECTIVE_MAX_LANES): at 1024^2 x P=8 the
    packed (N*P)-lane program needed 18.04G of the v5e's 15.75G HBM
    (measured OOM, config-5 100-spp driver); P=4 fits with room.
    """
    p_max = min(PASS_STACK, n_passes)
    if reflective:
        while p_max > 1 and n * p_max > STACK_REFLECTIVE_MAX_LANES:
            p_max -= 1
    p_eff = p_max
    for cand in range(p_eff, max(1, p_max - 2) - 1, -1):
        if n_passes % cand == 0:
            p_eff = cand  # exact divisor in the P-curve plateau
            break
    return p_eff


def render_accum(vol, opts, mc_tables, times, accum, ids=None, accel=None):
    """All spp passes via lax.scan (reference loop: core.clj:83-90).

    mc_tables: (iter, tableLen, 4); times: (iter,). The pass count is the
    leading axis, so spp is a runtime property of the inputs, not a retrace.

    On the deferred path the scan additionally carries the per-pixel cost
    maps of the previous pass, so every pass after the first renders with
    cost-sorted bands (see _render_pass_deferred). Cost maps are a pure
    scheduling signal — the carried accum values are identical either way.
    """
    n = accum.shape[0]
    tiles = auto_tiles(n)
    while tiles > 1 and (n % tiles != 0 or n // tiles < 512):
        tiles //= 2
    # effective stack: full PASS_STACK groups plus an unstacked TAIL for the
    # remainder (the tail passes continue the head's cost history). A clean
    # divisor is preferred only when it is near PASS_STACK — the measured
    # P-curve (round-4 sweep) plateaus at P=6-8 and drops sharply below
    # (P=4 cost ~1.17x of P=8 per pass), so e.g. 25 spp runs 3x8 stacked +
    # 1 tail pass rather than 5 groups of P=5, and 100 spp runs 12x8 + 4.
    p_eff = 1
    if PASS_STACK > 1 and accel is not None and (
            opts.reflectIter == 0
            or (STACK_REFLECTIVE and COMPACT_SECONDARY)):
        # Reflective presets stack at LANE granularity: the round-4
        # row-granularity attempt measured P=8 31.6 s vs P=1 23.75 at
        # config 4 (a pixel ROW stayed in the compacted secondary loops
        # while ANY of its P lanes was active); pooling the group's lanes
        # per-lane removes the union dilution — see the reflective branch
        # of _render_pass_deferred_stacked and STACK_REFLECTIVE.
        p_eff = stack_p(n, int(times.shape[0]), opts.reflectIter > 0)
    if tiles > 1 and DEFERRED_SHADE and p_eff > 1:
        # stacked trailing-lane engine (see PASS_STACK): bounce-free presets
        # on the accel path; reflective presets keep COMPACT_SECONDARY
        from .march import _carry_vma
        from .sampling import transpose_table, transpose_table_stacked

        if accel.rows_mxu is not None or accel.nrm_mxu is not None:
            # MXU one-hot row fetches are a measured 2.2x LOSS under
            # pass-stacking (64^3 mesh scene, 512^2/16spp, v5e: one-hot+P8
            # 12.52 s vs plain-gather+P8 5.82 s, bit-equal — PERFORMANCE.md
            # round 5; the one-hot MAC budget scales with band lanes x NB
            # while the XLA gather is ~flat in row width). Strip the
            # byte-plane copies for the stacked trace only — the structure
            # change retraces by itself; unstacked paths (preview/1 spp,
            # where the 25% win was measured) keep them. Output-exact: the
            # one-hot path is bit-equal by construction.
            accel_stacked = accel.replace(rows_mxu=None, nrm_mxu=None)
        else:
            accel_stacked = accel
        p = p_eff
        n_passes = int(times.shape[0])
        n_head = (n_passes // p) * p
        # stacked bands target STACK_TILE_ROWS rows (P trailing lanes each)
        stiles = 1
        while (stiles < MAX_TILES and n % (stiles * 2) == 0
               and n // (stiles * 2) >= STACK_TILE_ROWS):
            stiles *= 2
        ids_m = (jnp.arange(n, dtype=jnp.int32) if ids is None else ids)
        zero = jnp.zeros((n,), jnp.int32)
        cost_init = {"a": zero, "b": zero}
        if opts.reflectIter > 0 and LOOP_KEYS:
            # stacked reflective groups carry per-loop history like the
            # unstacked path (shade.compact_loop_names)
            from .shade import compact_loop_names

            cost_init["loops"] = {
                nm: zero for nm in compact_loop_names(opts)}
        if opts.reflectIter == 0:
            pre = _prepass_cost(vol, opts.replace(time=times[0]),
                                transpose_table(mc_tables[0]), ids_m,
                                accel_stacked, n, opts.resolution[0])
            if pre is not None:
                cost_init = pre
        elif PREPASS_REFLECTIVE:
            # On the UNSTACKED engine the reflective prepass measured a
            # wash (pass 0 is 1/16 of the work); under stacking group 0
            # is 1/n_groups of the frame, so the cold start is worth a
            # seed again (PERFORMANCE.md round 5 A/B).
            loop_names = list(cost_init.get("loops", {}))
            pre = _prepass_cost(vol, opts.replace(time=times[0]),
                                transpose_table(mc_tables[0]), ids_m,
                                accel_stacked, n, opts.resolution[0],
                                loops=loop_names or None)
            if pre is not None:
                cost_init["a"], cost_init["b"] = pre["a"], pre["b"]
                if loop_names:
                    cost_init["loops"] = pre["loops"]
        cost0 = _carry_vma(cost_init, accum)

        def step(carry, xs):
            acc, cost = carry
            ts, tabs = xs  # (p,), (p, L, 4)
            acc, new_cost = _render_pass_deferred_stacked(
                vol, opts, transpose_table_stacked(tabs), ts, acc, ids_m,
                accel_stacked, stiles, prev_cost=cost,
            )
            # decaying max over group history (as the unstacked path, one
            # update per group)
            cost = jax.tree_util.tree_map(
                lambda new, old: jnp.maximum(new, old - (old >> 2)),
                new_cost, cost,
            )
            return (acc, cost), None

        (accum, cost), _ = jax.lax.scan(
            step, (accum, cost0),
            (times[:n_head].reshape(-1, p),
             mc_tables[:n_head].reshape((-1, p) + mc_tables.shape[1:])),
        )
        if n_head == n_passes:
            return accum

        # tail: the remainder passes run UNSTACKED but continue the head's
        # cost history (per-pixel {"a","b"} maps have identical structure);
        # the tail keeps the original accel — the MXU one-hot is a wash
        # unstacked at spec and a win at 1 spp (PERFORMANCE.md round 5)
        def tail_step(carry, xs):
            acc, cost = carry
            t, table = xs
            acc, new_cost = render_pass(
                vol, opts.replace(time=t), table, acc, ids, accel,
                prev_cost=cost,
            )
            cost = jax.tree_util.tree_map(
                lambda new, old: jnp.maximum(new, old - (old >> 2)),
                new_cost, cost,
            )
            return (acc, cost), None

        (accum, _), _ = jax.lax.scan(
            tail_step, (accum, cost),
            (times[n_head:], mc_tables[n_head:]),
        )
        return accum
    if tiles > 1 and DEFERRED_SHADE:
        from .march import _carry_vma

        zero = jnp.zeros((n,), jnp.int32)
        cost_dict = {"a": zero, "b": zero}
        loop_names = None
        if LOOP_KEYS and COMPACT_SECONDARY and opts.reflectIter > 0:
            # reflective presets also carry PER-LOOP cost maps so each
            # compacted secondary loop band-sorts by its own history
            # (shade.compact_loop_names / _render_pass_deferred)
            from .shade import compact_loop_names

            loop_names = compact_loop_names(opts)
            cost_dict["loops"] = {nm: zero for nm in loop_names}
        # pass-0 cold-start prepass (see PREPASS_STRIDE) — bounce-free
        # presets only: at config 4 (metal+scatter, 512^2/16spp) the
        # reflective prepass measured a WASH on v5e (17.93 s off vs
        # 18.01 s on, bit-equal; per-loop seeds from a strided probe don't
        # transfer to bounce loops while the probe still costs a pass
        # fraction — PERFORMANCE.md round 5), so reflective presets keep
        # the zero seed.
        if opts.reflectIter == 0 and accel is not None:
            from .sampling import transpose_table

            ids_m = (jnp.arange(n, dtype=jnp.int32) if ids is None else ids)
            pre = _prepass_cost(vol, opts.replace(time=times[0]),
                                transpose_table(mc_tables[0]), ids_m, accel,
                                n, opts.resolution[0], loops=loop_names)
            if pre is not None:
                cost_dict = pre
        # scan carries need matching varying-manual-axes under shard_map
        # (see march._carry_vma)
        cost0 = _carry_vma(cost_dict, accum)

        def step(carry, xs):
            acc, cost = carry
            t, table = xs
            acc, new_cost = render_pass(
                vol, opts.replace(time=t), table, acc, ids, accel,
                prev_cost=cost,
            )
            # decaying max over the pass history: per-pass jitter makes a
            # single pass's cost a noisy predictor; the running max with a
            # mild decay tracks the local worst case the band sort needs
            cost = jax.tree_util.tree_map(
                lambda new, old: jnp.maximum(new, old - (old >> 2)),
                new_cost, cost,
            )
            return (acc, cost), None

        (accum, _), _ = jax.lax.scan(step, (accum, cost0), (times, mc_tables))
        return accum

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
    accum: (N, 3) -> (N,) uint32.

    On TPU this runs the fused Pallas kernel (ops/kernels/tonemap_pallas.py,
    bit-identical — same clamped f32 ops — asserted in tests/test_pallas.py
    and verified on v5e); other backends use the plain-jnp path."""
    if jax.default_backend() == "tpu":
        from .kernels.tonemap_pallas import tonemap_pack_pallas

        return tonemap_pack_pallas(accum, opts.gamma)
    col = tonemap(accum, opts.gamma) * 255.0
    col = jnp.clip(col, 0.0, 255.0).astype(jnp.uint32)
    return (
        jnp.uint32(0xFF000000)
        | (col[:, 0] << 16)
        | (col[:, 1] << 8)
        | col[:, 2]
    )


def render_image(vol, opts, mc_tables, times=None, accum=None, accel=None,
                 host_slices=1):
    """End-to-end frame: spp passes + tonemap.

    Returns (argb (H, W) uint32, accum (N, 3) float32). `accum` may be passed
    back in to continue refining (the reference's persistent p-buf,
    core.clj:194-208).

    host_slices > 1 renders the frame as that many row blocks in separate
    device programs — results identical (pixel ids drive all per-ray state),
    used for very large frames whose single program exceeds what the hosted
    worker survives (e.g. 1024^2 with reflective presets).
    """
    n_passes = mc_tables.shape[0]
    if times is None:
        times = (jnp.arange(n_passes, dtype=_F32) * TIME_STEP_INIT)
    if accum is None:
        accum = jnp.zeros((opts.num_pixels, 3), _F32)
    w, h = opts.resolution
    n = opts.num_pixels
    if host_slices > 1 and n % host_slices == 0:
        ns = n // host_slices
        parts = []
        for s in range(host_slices):
            ids = jnp.arange(s * ns, (s + 1) * ns, dtype=jnp.int32)
            parts.append(
                _render_slice_jit(
                    vol, opts, mc_tables, times, accum[s * ns : (s + 1) * ns],
                    ids, accel,
                )
            )
        accum = jnp.concatenate(parts, axis=0)
        argb = _pack_jit(opts, accum)
        return np.asarray(argb).reshape(h, w), accum
    argb, accum = _render_jit(vol, opts, mc_tables, times, accum, accel)
    return np.asarray(argb).reshape(h, w), accum


def engine_key():
    """Hashable snapshot of every module-level scheduling flag that shapes
    the traced render program. The flags are trace-time constants, NOT
    pytree state — without this key a flag flip silently reuses the cached
    program (the CLAUDE.md footgun that made two round-2 invariant checks
    vacuous). The jitted entries below take the key as a static arg, so
    flipping any flag retraces by itself; `clear_cache()` calls in older
    A/B scripts remain valid but are no longer load-bearing."""
    from . import accel, march, shade

    return (
        DEFERRED_SHADE, TILE_RAYS, MAX_TILES, COMPACT_SECONDARY, LOOP_KEYS,
        PASS_STACK, STACK_TILE_ROWS, STACK_REFLECTIVE,
        STACK_REFLECTIVE_MAX_LANES, PREPASS_REFLECTIVE,
        PREPASS_STRIDE, PREPASS_FILT,
        march.MARCH_CHUNK, march.GROUND_STEPS, march.DIST_UNROLL,
        march.FLAT_UNROLL, march.FLAT_GROUND_STEPS, march.WIDE_SUBSTEPS,
        march.WIDE_GROUND, march.SUBSTEPS_REFLECTIVE,
        shade.KEYED_TILE_ROWS,
        accel.BRICK_SUBSTEPS, accel.SKIP_SLACK,
    )


class _FlagKeyedJit:
    """Callable shim around a jitted fn that injects the current
    engine_key() as a static argument on every call (see engine_key)."""

    def __init__(self, fn):
        import functools

        self._jitted = jax.jit(fn, static_argnames=("ekey",))
        functools.update_wrapper(self, fn)

    def __call__(self, *args, **kw):
        return self._jitted(*args, ekey=engine_key(), **kw)

    def clear_cache(self):
        self._jitted.clear_cache()


@_FlagKeyedJit
def _render_slice_jit(vol, opts, mc_tables, times, accum, ids, accel=None,
                      *, ekey=None):
    return render_accum(vol, opts, mc_tables, times, accum, ids=ids, accel=accel)


@jax.jit
def _pack_jit(opts, accum):
    return pack_argb(opts, accum)


@_FlagKeyedJit
def _render_jit(vol, opts, mc_tables, times, accum, accel=None, *, ekey=None):
    accum = render_accum(vol, opts, mc_tables, times, accum, accel=accel)
    return pack_argb(opts, accum), accum
