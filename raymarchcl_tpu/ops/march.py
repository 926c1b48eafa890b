"""Core marcher: box intersection, voxel sampling, fixed-step volume march,
sphere-trace loop, and voxel normals.

Capability parity with reference: resources/renderer.cl:146-257 (raymarch,
distanceToScene, intersectsBox, voxelLookup, voxelNormal/Smooth,
voxelMaterial, distUnion) — but redesigned for the TPU:

* SoA everywhere: rays are V3 triples of flat (N,) arrays; chunked march
  samples are (CH, N) planes with RAYS ON THE LANE DIMENSION, so every
  vector op runs at full 8x128 register occupancy (see ops/vecmath.py).

* The per-ray `while` voxel march (renderer.cl:219-234) becomes a *chunked
  vectorized gather*: the reference marches in FIXED steps, so all sample
  positions p_k = p0 + k*delta are known up front; each loop round gathers a
  whole chunk of CH samples for every ray at once and resolves first-hit /
  first-exit with argmax over the chunk axis. The round loop is a
  `lax.while_loop` with a `jnp.any(active)` early exit, so secondary rays
  that resolve immediately cost one round, not 192 scalar steps.

* Normal estimation (renderer.cl:180-203) is deferred: marching only tracks
  the hit voxel coordinate; gradient gathers run ONCE per raymarch (not per
  sphere-trace round) and never for shadow/AO rays, whose normals the
  reference computes and discards. The smooth 3x3x3-of-gradients normal
  comes from one (5^3, N) occupancy gather instead of 189 pointwise lookups.

All semantics (step counts, break conditions, distUnion tie-breaks, the
ground-plane "material = its own distance" quirk, C truncation-toward-zero
voxel addressing) match the reference; tests/test_parity.py checks pixels
against a literal scalar transcription of the OpenCL.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .vecmath import V3, dot, norm, normalize, where3

# Samples gathered per ray per round of the fixed-step march: (CH, N)
# planes, CH a multiple of the 8-sublane tile height. 16 balances round
# count for long marches against speculative over-sampling for secondary
# rays that stop immediately. (Plain path only — with a distance-field
# accel the march gathers one distance value per landing instead.)
MARCH_CHUNK = 16

# Ground-only sphere-trace steps executed per raymarch round for rays whose
# line misses the voxel box (see raymarch docstring).
GROUND_STEPS = 16

# Distance-driven march probe steps unrolled per while_loop round (amortizes
# round overhead; each probe is one (N,) gather plus vector math). 8 was the
# sweep optimum on v5e (scripts/tune.py, 256^2 ao: 472 ms vs 516 at 4).
DIST_UNROLL = 8

_I32 = jnp.int32
_F32 = jnp.float32


def dist_union(d1, m1, d2, m2):
    """distUnion (reference: renderer.cl:146-148): pick the pair with the
    strictly smaller distance (ties -> second arg)."""
    take1 = d1 < d2
    return jnp.where(take1, d1, d2), jnp.where(take1, m1, m2)


def intersects_box(bmin, bmax, p: V3, d: V3):
    """Slab test (reference: renderer.cl:153-161). Returns entry distance or
    -1.0 where the ray misses. bmin/bmax: python/np 3-sequences."""
    a = jnp.zeros_like(p.x)
    b = None
    for c in range(3):
        dc = (d.x, d.y, d.z)[c]
        pc = (p.x, p.y, p.z)[c]
        d_safe = jnp.where(dc == 0.0, 1e-30, dc)
        o1 = (bmin[c] - pc) / d_safe
        o2 = (bmax[c] - pc) / d_safe
        lo = jnp.minimum(o1, o2)
        hi = jnp.maximum(o1, o2)
        a = jnp.maximum(a, lo)
        b = hi if b is None else jnp.minimum(b, hi)
    return jnp.where(b > a, a, -1.0)


def _res_f32(opts):
    rx, ry, rz, _ = opts.voxelRes
    return _F32(rx), _F32(ry), _F32(rz)


def voxel_coord(opts, p: V3) -> V3:
    """Float volume-space position -> integer voxel coord, C-style
    truncation toward zero (reference: renderer.cl:165 convert_int3_sat)."""
    rx, ry, rz = _res_f32(opts)
    return V3(
        (p.x * rx).astype(_I32), (p.y * ry).astype(_I32), (p.z * rz).astype(_I32)
    )


def _bounds_and_index(opts, q: V3):
    rx, ry, rz, rxy = opts.voxelRes
    valid = (
        (q.x >= 0) & (q.x < rx)
        & (q.y >= 0) & (q.y < ry)
        & (q.z >= 0) & (q.z < rz)
    )
    idx = q.z * rxy + q.y * rx + q.x
    return valid, jnp.where(valid, idx, 0)


def voxel_fetch(vol, opts, q: V3):
    """Bounds-checked byte fetch at integer coords -> (value int32 with -1
    OOB, valid mask). The gather itself is uint8 (minimal HBM traffic)."""
    valid, idx = _bounds_and_index(opts, q)
    v = jnp.take(vol, idx, mode="clip").astype(_I32)
    return jnp.where(valid, v, -1), valid


def voxel_lookup(vol, opts, p):
    """Nearest-neighbor byte fetch; -1 outside the grid
    (reference: renderer.cl:163-170). Accepts V3 or an (..., 3) array."""
    if not isinstance(p, V3):
        p = V3.from_array(p)
    return voxel_fetch(vol, opts, voxel_coord(opts, p))[0]


def occupancy_i(vol, opts, q):
    """voxelLookupI (reference: renderer.cl:172-178): step(isoVal, v) with
    0.0 outside the grid. Accepts V3 (or (..., 3) int array) -> float32."""
    if not isinstance(q, V3):
        q = V3.from_array(q)
    valid, idx = _bounds_and_index(opts, q)
    v = jnp.take(vol, idx, mode="clip")
    return jnp.where(valid & (v >= jnp.uint8(opts.isoVal)), 1.0, 0.0).astype(_F32)


def voxel_material(v):
    """Byte value -> material slot: v<84 -> 1, v<168 -> 2, else 3
    (reference: renderer.cl:205-207)."""
    return jnp.where(v < 84, 1.0, jnp.where(v < 168, 2.0, 3.0)).astype(_F32)


# 5^3 neighborhood offsets for the smooth normal, component-planes (125,)
_r5 = np.arange(-2, 3, dtype=np.int32)
_OX5, _OY5, _OZ5 = (
    o.reshape(-1) for o in np.meshgrid(_r5, _r5, _r5, indexing="ij")
)


def voxel_normal_fast(vol, opts, q: V3) -> V3:
    """Central-difference occupancy gradient, normalized
    (reference: renderer.cl:180-188 + normalize at :228). q: V3 of (N,)."""
    occ = lambda dx, dy, dz: occupancy_i(vol, opts, V3(q.x + dx, q.y + dy, q.z + dz))
    n = V3(
        occ(1, 0, 0) - occ(-1, 0, 0),
        occ(0, 1, 0) - occ(0, -1, 0),
        occ(0, 0, 1) - occ(0, 0, -1),
    )
    return normalize(-n)


def voxel_normal_smooth(vol, opts, q: V3) -> V3:
    """Sum of gradient normals over the occupied 3x3x3 neighborhood,
    normalized (reference: renderer.cl:190-203).

    One (125, N) occupancy gather; gradients by shifted slicing of the
    (5, 5, 5, N) occupancy block.
    """
    n = q.x.shape[0]
    qq = V3(
        q.x[None, :] + jnp.asarray(_OX5)[:, None],
        q.y[None, :] + jnp.asarray(_OY5)[:, None],
        q.z[None, :] + jnp.asarray(_OZ5)[:, None],
    )
    occ = occupancy_i(vol, opts, qq).reshape(5, 5, 5, n)  # [dx, dy, dz, ray]
    c = occ[1:4, 1:4, 1:4]
    gx = occ[2:5, 1:4, 1:4] - occ[0:3, 1:4, 1:4]
    gy = occ[1:4, 2:5, 1:4] - occ[1:4, 0:3, 1:4]
    gz = occ[1:4, 1:4, 2:5] - occ[1:4, 1:4, 0:3]
    w = (c > 0.0).astype(_F32)
    nv = V3(
        -jnp.sum(w * gx, axis=(0, 1, 2)),
        -jnp.sum(w * gy, axis=(0, 1, 2)),
        -jnp.sum(w * gz, axis=(0, 1, 2)),
    )
    return normalize(nv)


def march_volume(
    vol, opts, p0: V3, delta: V3, steps, active, chunk=None,
    accel=None, max_k=None, max_k_dyn=None,
):
    """Fixed-step march through normalized volume space
    (reference: renderer.cl:219-234): the first k in [0, steps) whose sample
    leaves the grid (break) or exceeds isoVal (hit).

    Returns (hit (N,) bool, hit_k (N,) int32); the hit voxel VALUE is
    re-fetched by the caller from hit_k (one (N,) gather) instead of being
    threaded through the loop.

    Two implementations, BIT-EQUAL by construction (tests/test_accel.py):

    * accel=None: per while-round, build (chunk, N) coordinate planes, one
      batched occupancy gather, argmax first-hit/first-exit resolution.
      Early-exits when every ray stopped. Evaluates every fixed-step sample
      like the reference.
    * accel=ops.accel.Accel: distance-driven. Each landing gathers the
      Chebyshev distance field instead of the volume: d==0 IS the stopping
      test, d>0 licenses skipping floor((d-slack)*inv_vps) samples that are
      provably in-bounds and below iso (see ops/accel.py). Gathered elements
      = landings, not samples.

    `max_k` truncates the EVALUATED portion of the budget without changing
    the step length (delta still derives from `steps`): samples k >= max_k
    are treated as not reached. Callers use it where results are provably
    insensitive to hits beyond max_k (see shade.ambient_occlusion).
    `max_k_dyn` is the same cap per-ray as an (N,) int32 array (see
    raymarch's shadow truncation).
    """
    if accel is not None:
        return _march_volume_dist(
            opts, accel, p0, delta, steps, active, max_k=max_k, max_k_dyn=max_k_dyn
        )
    if chunk is None:
        chunk = MARCH_CHUNK
    eff = steps if max_k is None else min(steps, max_k)
    n = p0.x.shape[0]
    n_rounds = -(-eff // chunk)
    iso = _I32(opts.isoVal)
    ks = jnp.arange(chunk, dtype=_F32)[:, None]  # (CH, 1)
    ksi = jnp.arange(chunk, dtype=_I32)[:, None]

    def cond(c):
        return (c[0] < n_rounds) & jnp.any(c[1])

    def body(c):
        i, act, k, hit, hit_k = c
        kk = k.astype(_F32)[None, :] + ks  # (CH, N)
        p = V3(
            p0.x[None, :] + delta.x[None, :] * kk,
            p0.y[None, :] + delta.y[None, :] * kk,
            p0.z[None, :] + delta.z[None, :] * kk,
        )
        v, _ = voxel_fetch(vol, opts, voxel_coord(opts, p))  # (CH, N)
        kabs = k[None, :] + ksi
        valid_k = kabs < eff
        if max_k_dyn is not None:
            valid_k &= kabs < max_k_dyn[None, :]
        oob = (v < 0) & valid_k
        hitm = (v > iso) & valid_k
        any_oob = jnp.any(oob, axis=0)
        any_hit = jnp.any(hitm, axis=0)
        first_oob = jnp.argmax(oob, axis=0)  # (N,)
        first_hit = jnp.argmax(hitm, axis=0)
        is_hit = any_hit & (~any_oob | (first_hit < first_oob))
        first = jnp.where(is_hit, first_hit, first_oob)
        any_stop = any_oob | any_hit
        newly = act & any_stop
        k_next = k + chunk
        still = act & ~any_stop & (k_next < eff)
        if max_k_dyn is not None:
            still &= k_next < max_k_dyn
        return (
            i + 1,
            still,
            k_next,
            jnp.where(newly, is_hit, hit),
            jnp.where(newly, k + first, hit_k),
        )

    init = (
        _I32(0),
        active,
        jnp.zeros((n,), _I32),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), _I32),
    )
    _, _, _, hit, hit_k = jax.lax.while_loop(cond, body, init)
    return hit, hit_k


def _march_volume_dist(opts, accel, p0: V3, delta: V3, steps, active, max_k=None, max_k_dyn=None):
    """Distance-driven fixed-step march (see march_volume). Per probe step:
    one (N,) gather of the Chebyshev distance field at the current sample;
    stop on out-of-bounds (break) or d==0 (hit, since d counts exactly the
    {v > isoVal} U {outside} set); otherwise advance 1 + provable skip.

    Exactness: every skipped sample index lies strictly within the gathered
    distance of the probe voxel (incl. trunc + f32 slack, ops/accel.py), so
    it is provably in-bounds and not a hit — the first stopping landing is
    the reference march's first stopping sample. Rays whose step budget is
    exhausted (k reaches the cap before any stop) report hit=False exactly
    like the plain path.
    """
    from .accel import SKIP_SLACK, skips_per_distance

    eff = steps if max_k is None else min(steps, max_k)
    n = p0.x.shape[0]
    inv_vps = skips_per_distance(opts, delta)  # (N,) f32
    cap = jnp.full((n,), eff, _I32)
    if max_k_dyn is not None:
        cap = jnp.minimum(cap, max_k_dyn)

    def probe_step(act, k, hit, hit_k):
        kf = k.astype(_F32)
        p = V3(p0.x + delta.x * kf, p0.y + delta.y * kf, p0.z + delta.z * kf)
        q = voxel_coord(opts, p)
        valid, idx = _bounds_and_index(opts, q)
        d = jnp.take(accel.dist, idx, mode="clip")  # (N,) uint8
        stop_hit = valid & (d == 0)
        newly = act & (~valid | stop_hit)
        hit = jnp.where(newly, stop_hit, hit)
        hit_k = jnp.where(newly, k, hit_k)
        # clip keeps the f32->i32 cast in-range (inv_vps can be 1e30 for
        # degenerate rays; 2^30 steps is "past any budget" either way)
        skip = jnp.clip((d.astype(_F32) - SKIP_SLACK) * inv_vps, 0.0, 2.0**30).astype(_I32)
        k_next = k + 1 + skip
        act = act & ~newly & (k_next < cap)
        return act, k_next, hit, hit_k

    def cond(c):
        return jnp.any(c[0])

    def body(c):
        act, k, hit, hit_k = c
        for _ in range(DIST_UNROLL):
            act, k, hit, hit_k = probe_step(act, k, hit, hit_k)
        return act, k, hit, hit_k

    init = (
        active & (cap > 0),
        jnp.zeros((n,), _I32),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), _I32),
    )
    _, _, hit, hit_k = jax.lax.while_loop(cond, body, init)
    return hit, hit_k


def distance_to_scene(vol, opts, rpos: V3, rdir: V3, steps, active, chunk=None, accel=None, idist=None, max_k=None, max_k_dyn=None):
    """Scene distance = ground plane U voxel volume
    (reference: renderer.cl:209-237).

    Returns dict: dist (N,), mat (N,) float (ground quirk: its own
    distance), hit (N,) bool, q (V3 int hit voxel coords), gd (N,).
    Normals are NOT computed here — see `isec_normal`.
    """
    gd = rpos.y + opts.groundY
    # distUnion((gd, gd), (1e5, -1)) — the scalar float2 broadcast makes the
    # ground's "material" its own distance (renderer.cl:211)
    res_d, res_m = dist_union(gd, gd, jnp.full_like(gd, 1e5), jnp.full_like(gd, -1.0))

    if idist is None:
        idist = intersects_box(_np3(opts.voxelBoundsMin), _np3(opts.voxelBoundsMax), rpos, rdir)
    march_mask = active & (idist >= 0.0) & (idist < res_d)

    inv_s = _np3(opts.invVoxelScale)
    vb = _np3(opts.voxelBounds)
    scale = 1.0 / (steps * 0.5)
    delta = V3(rdir.x * scale * inv_s[0], rdir.y * scale * inv_s[1], rdir.z * scale * inv_s[2])
    adv = jnp.where(idist > 0.0, idist, 0.0)
    p0 = V3(
        (rpos.x + vb[0] + rdir.x * adv) * inv_s[0],
        (rpos.y + vb[1] + rdir.y * adv) * inv_s[1],
        (rpos.z + vb[2] + rdir.z * adv) * inv_s[2],
    )

    hit, hit_k = march_volume(vol, opts, p0, delta, steps, march_mask, chunk, accel, max_k=max_k, max_k_dyn=max_k_dyn)
    kf = hit_k.astype(_F32)
    hit_p = V3(p0.x + delta.x * kf, p0.y + delta.y * kf, p0.z + delta.z * kf)
    q = voxel_coord(opts, hit_p)
    hit_v, _ = voxel_fetch(vol, opts, q)  # re-fetch value at hit (N,)
    vb2 = _np3(opts.voxelBounds2)
    world = V3(hit_p.x * vb2[0] - vb[0], hit_p.y * vb2[1] - vb[1], hit_p.z * vb2[2] - vb[2])
    vdist = norm(rpos - world) - opts.voxelSize
    vmat = voxel_material(hit_v)

    hd, hm = dist_union(vdist, vmat, res_d, res_m)
    return {
        "dist": jnp.where(hit, hd, res_d),
        "mat": jnp.where(hit, hm, res_m),
        "hit": hit,
        "q": q,
        "gd": gd,
    }


def _np3(x):
    """Static 3-vector RenderOpts fields are python tuples; they fold into
    the compiled program as immediate constants."""
    return tuple(float(v) for v in x)


def isec_normal(vol, opts, hit, q, gd, rdir: V3, smooth):
    """Deferred normal for a distance_to_scene / raymarch result
    (reference: renderer.cl:212 ground/backstop, :225-229 voxel gradient)."""
    ground_n = where3(
        gd < 1e5, V3.const((0.0, 1.0, 0.0), like=rdir), -rdir
    )
    vn = (voxel_normal_smooth if smooth else voxel_normal_fast)(vol, opts, q)
    return where3(hit, vn, ground_n)


def raymarch(
    vol,
    opts,
    ray_pos: V3,
    ray_dir: V3,
    max_dist,
    max_steps,
    smooth,
    active,
    want_normal=True,
    chunk=None,
    accel=None,
    truncate_to_max_dist=False,
):
    """Sphere-trace loop (reference: renderer.cl:239-257).

    max_dist may be scalar or per-ray (N,). max_steps/smooth/want_normal are
    static. Returns dict isec {pos: V3, distance, object_id, normal?: V3}.

    Keeps the reference's loop structure: each round re-marches the volume
    from the current position (renderer.cl:245); rounds stop when all rays
    converged (|d| <= eps), escaped (>= max_dist), or the budget ran out;
    misses rewrite to objectID=-1 / distance=1000 (renderer.cl:252-256).
    Normals resolve once post-loop from the tracked hit voxel.

    With truncate_to_max_dist=True (used for shadow rays, whose only
    consumer is `distance >= light_max_dist`), each round's volume march is
    capped per-ray at the steps that could still place a hit within
    max_dist (+eps +voxelSize margin). Output-identical proof: a hit
    farther than the remaining distance either loses distUnion to the
    ground term (same sd either way) or overshoots max_dist (same
    miss-fixup either way); shadow() never reads normals/object ids.

    Ground-tail fast path: rays whose LINE misses the voxel box
    (intersectsBox < 0 — permanent once true) have a purely scalar scene
    distance (the ground plane), so instead of one sphere-trace step per
    round they iterate GROUND_STEPS steps of the exact same recurrence in
    cheap unrolled (N,) math — replicating the reference's per-step ops
    bit-for-bit while collapsing the long convergence tail of grazing
    ground/sky rays. Per-ray step counters keep the maxIter budget exact.
    """
    n = ray_pos.x.shape[0]
    max_dist = jnp.broadcast_to(jnp.asarray(max_dist, _F32), (n,))
    bmin = _np3(opts.voxelBoundsMin)
    bmax = _np3(opts.voxelBoundsMax)
    if truncate_to_max_dist:
        f_min = min(
            a * b for a, b in zip(_np3(opts.invVoxelScale), _np3(opts.voxelBounds2))
        )
        # world distance per march step, per unit |dir| (dirs may be
        # unnormalized for glossy bounces — scale dynamically)
        base_step = (2.0 / opts.maxVoxelIter) * f_min
        inv_steplen = 1.0 / (base_step * jnp.maximum(norm(ray_dir), 1e-20))

    carry = {
        "round": _I32(0),
        "s": jnp.zeros((n,), _I32),  # per-ray steps consumed
        "active": active,
        "dist": jnp.broadcast_to(opts.startDist, (n,)).astype(_F32),
        "obj": jnp.zeros((n,), _I32),
        "pos": ray_pos,
        "hit": jnp.zeros((n,), bool),
        "q": V3(jnp.zeros((n,), _I32), jnp.zeros((n,), _I32), jnp.zeros((n,), _I32)),
        "gd": jnp.zeros((n,), _F32),
    }

    def cond(c):
        # every active ray consumes >= 1 step per round, so the round count
        # is bounded by max_steps
        return (c["round"] < max_steps) & jnp.any(c["active"])

    def one_ground_step(a, c):
        """One exact sphere-trace step against the ground only (the full
        path's behavior when the box test fails, renderer.cl:211-214 with
        no march). Re-checks the box test per step: a ray below ground
        steps BACKWARD (gd < 0) and can bring the box ahead again, at which
        point it must leave the fast path."""
        pos = ray_pos + ray_dir * c["dist"]
        a = a & (intersects_box(bmin, bmax, pos, ray_dir) < 0.0)
        gd = pos.y + opts.groundY
        res_d, res_m = dist_union(
            gd, gd, jnp.full_like(gd, 1e5), jnp.full_like(gd, -1.0)
        )
        done = (jnp.abs(res_d) <= opts.eps) | (c["dist"] >= max_dist)
        s = jnp.where(a, c["s"] + 1, c["s"])
        return {
            "round": c["round"],
            "s": s,
            "active": c["active"] & ~(a & (done | (s >= max_steps))),
            "dist": jnp.where(a & ~done, c["dist"] + res_d, c["dist"]),
            "obj": jnp.where(a, res_m.astype(_I32), c["obj"]),
            "pos": where3(a, pos, c["pos"]),
            "hit": jnp.where(a, False, c["hit"]),
            "q": c["q"],
            "gd": jnp.where(a, gd, c["gd"]),
        }

    def body(c):
        a = c["active"]
        pos = ray_pos + ray_dir * c["dist"]
        idist = intersects_box(bmin, bmax, pos, ray_dir)
        slow = a & (idist >= 0.0)
        mkd = None
        if truncate_to_max_dist:
            remaining = max_dist - c["dist"]
            mkd = jnp.clip(
                ((remaining + opts.eps + opts.voxelSize) * inv_steplen + 3.0),
                0.0,
                _F32(opts.maxVoxelIter),
            ).astype(_I32)
        # --- slow path: full scene distance incl. volume march (1 step) ---
        sd = distance_to_scene(
            vol, opts, pos, ray_dir, opts.maxVoxelIter, slow, chunk, accel,
            idist=idist, max_k_dyn=mkd,
        )
        done = (jnp.abs(sd["dist"]) <= opts.eps) | (c["dist"] >= max_dist)
        s = jnp.where(slow, c["s"] + 1, c["s"])
        qi = sd["q"]
        c = {
            "round": c["round"] + 1,
            "s": s,
            "active": a & ~(slow & (done | (s >= max_steps))),
            "dist": jnp.where(slow & ~done, c["dist"] + sd["dist"], c["dist"]),
            "obj": jnp.where(slow, sd["mat"].astype(_I32), c["obj"]),
            "pos": where3(slow, pos, c["pos"]),
            "hit": jnp.where(slow, sd["hit"], c["hit"]),
            "q": V3(
                jnp.where(slow, qi.x, c["q"].x),
                jnp.where(slow, qi.y, c["q"].y),
                jnp.where(slow, qi.z, c["q"].z),
            ),
            "gd": jnp.where(slow, sd["gd"], c["gd"]),
        }
        # --- fast path: ground-only recurrence, GROUND_STEPS steps --------
        # (the first step's box test is the round's idist; later steps
        # re-check inside one_ground_step)
        fast0 = a & (idist < 0.0)
        for _ in range(max(GROUND_STEPS, 1)):
            c = one_ground_step(fast0 & c["active"], c)
        return c

    c = jax.lax.while_loop(cond, body, carry)

    miss = c["dist"] >= max_dist
    isec = {
        "pos": where3(miss, ray_pos + ray_dir * c["dist"], c["pos"]),
        "distance": jnp.where(miss, 1000.0, c["dist"]),
        "object_id": jnp.where(miss, -1, c["obj"]),
    }
    if want_normal:
        isec["normal"] = isec_normal(
            vol, opts, c["hit"] & ~miss, c["q"], c["gd"], ray_dir, smooth
        )
    return isec
