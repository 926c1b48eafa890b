"""Core marcher: box intersection, voxel sampling, fixed-step volume march,
sphere-trace loop, and voxel normals.

Capability parity with reference: resources/renderer.cl:146-257 (raymarch,
distanceToScene, intersectsBox, voxelLookup, voxelNormal/Smooth,
voxelMaterial, distUnion) — but the implementation is redesigned for TPU:

* The per-ray `while` voxel march (renderer.cl:219-234) becomes a *chunked
  vectorized gather*: because the reference marches in FIXED steps, all
  sample positions p_k = p0 + k*delta are known up front, so each loop round
  gathers a whole chunk of C samples for every ray at once and resolves the
  first hit/exit with vector ops. The chunk loop is a `lax.while_loop` with a
  `jnp.any(active)` early exit, so secondary rays that hit immediately cost
  one chunk, not 192 scalar steps.

* Normal estimation (renderer.cl:180-203) is deferred: during marching only
  the hit voxel coordinate is tracked; the gradient / smoothed-gradient
  gathers run ONCE per raymarch (not once per sphere-trace round), and not at
  all for shadow/AO rays, whose normals the reference computes and discards.
  The smooth 3x3x3-of-gradients normal is computed from a single (N, 5^3)
  occupancy gather instead of 189 pointwise lookups.

All semantics (step counts, break conditions, distUnion tie-breaks, the
ground-plane "material = its own distance" quirk) match the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .vecmath import normalize, norm

# Samples gathered per ray per chunk round of the fixed-step march.
MARCH_CHUNK = 32

_I32 = jnp.int32
_F32 = jnp.float32


def dist_union(d1, m1, d2, m2):
    """distUnion (reference: renderer.cl:146-148): pick the pair with the
    strictly smaller distance (ties -> second arg)."""
    take1 = d1 < d2
    return jnp.where(take1, d1, d2), jnp.where(take1, m1, m2)


def intersects_box(bmin, bmax, p, d):
    """Slab test (reference: renderer.cl:153-161). Returns entry distance or
    -1.0 where the ray misses. p, d: (N, 3); bmin/bmax: (3,)."""
    d_safe = jnp.where(d == 0.0, 1e-30, d)
    omin = (bmin - p) / d_safe
    omax = (bmax - p) / d_safe
    lo = jnp.minimum(omax, omin)
    hi = jnp.maximum(omax, omin)
    a = jnp.maximum(jnp.maximum(lo[..., 0], 0.0), jnp.maximum(lo[..., 1], lo[..., 2]))
    b = jnp.minimum(hi[..., 0], jnp.minimum(hi[..., 1], hi[..., 2]))
    return jnp.where(b > a, a, -1.0)


def voxel_coord(opts, p):
    """Float [0,1]^3-ish position -> integer voxel coord, C-style truncation
    toward zero (reference: renderer.cl:165 convert_int3_sat)."""
    res = jnp.asarray(opts.voxelRes[:3], dtype=_F32)
    return (p * res).astype(_I32)


def _flat_index(opts, q):
    rx, ry, rz, rxy = opts.voxelRes
    valid = (
        (q[..., 0] >= 0) & (q[..., 0] < rx)
        & (q[..., 1] >= 0) & (q[..., 1] < ry)
        & (q[..., 2] >= 0) & (q[..., 2] < rz)
    )
    idx = q[..., 2] * rxy + q[..., 1] * rx + q[..., 0]
    return jnp.where(valid, idx, 0), valid


def voxel_lookup(vol, opts, p):
    """Nearest-neighbor byte fetch; -1 outside the grid
    (reference: renderer.cl:163-170). p: (..., 3) -> int32 (...)."""
    q = voxel_coord(opts, p)
    idx, valid = _flat_index(opts, q)
    v = jnp.take(vol, idx, mode="clip").astype(_I32)
    return jnp.where(valid, v, -1)


def occupancy_i(vol, opts, q):
    """voxelLookupI (reference: renderer.cl:172-178): step(isoVal, v) with
    0.0 outside the grid. q: (..., 3) int32 -> float32 (...)."""
    idx, valid = _flat_index(opts, q)
    v = jnp.take(vol, idx, mode="clip")
    return jnp.where(valid & (v >= jnp.uint8(opts.isoVal)), 1.0, 0.0).astype(_F32)


def voxel_material(v):
    """Byte value -> material slot: v<84 -> 1, v<168 -> 2, else 3
    (reference: renderer.cl:205-207)."""
    return jnp.where(v < 84, 1.0, jnp.where(v < 168, 2.0, 3.0)).astype(_F32)


# 5^3 neighborhood offsets, off[i,j,k] = (di-2, dj-2, dk-2) on (x, y, z)
_r5 = np.arange(-2, 3)
_OFF5 = np.stack(np.meshgrid(_r5, _r5, _r5, indexing="ij"), axis=-1).astype(np.int32)

# 6-point stencil for the fast gradient normal (+x,-x,+y,-y,+z,-z)
_OFF6 = np.array(
    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    dtype=np.int32,
)


def voxel_normal_fast(vol, opts, q):
    """Central-difference occupancy gradient, normalized
    (reference: renderer.cl:180-188 + normalize at :228). q: (N,3)."""
    qq = q[:, None, :] + jnp.asarray(_OFF6)  # (N, 6, 3)
    occ = occupancy_i(vol, opts, qq)  # (N, 6)
    n = -jnp.stack(
        [occ[:, 0] - occ[:, 1], occ[:, 2] - occ[:, 3], occ[:, 4] - occ[:, 5]], axis=-1
    )
    return normalize(n)


def voxel_normal_smooth(vol, opts, q):
    """Sum of gradient normals over the occupied 3x3x3 neighborhood,
    normalized (reference: renderer.cl:190-203).

    One (N, 125) occupancy gather; gradients by shifted slicing.
    """
    qq = q[:, None, :] + jnp.asarray(_OFF5.reshape(125, 3))  # (N, 125, 3)
    occ = occupancy_i(vol, opts, qq).reshape((-1, 5, 5, 5))  # [n, dx, dy, dz]
    c = occ[:, 1:4, 1:4, 1:4]
    gx = occ[:, 2:5, 1:4, 1:4] - occ[:, 0:3, 1:4, 1:4]
    gy = occ[:, 1:4, 2:5, 1:4] - occ[:, 1:4, 0:3, 1:4]
    gz = occ[:, 1:4, 1:4, 2:5] - occ[:, 1:4, 1:4, 0:3]
    w = (c > 0.0).astype(_F32)
    n = -jnp.stack(
        [
            jnp.sum(w * gx, axis=(1, 2, 3)),
            jnp.sum(w * gy, axis=(1, 2, 3)),
            jnp.sum(w * gz, axis=(1, 2, 3)),
        ],
        axis=-1,
    )
    return normalize(n)


def march_volume(vol, opts, p0, delta, steps, active, chunk=MARCH_CHUNK):
    """Fixed-step march through normalized volume space
    (reference: renderer.cl:219-234): the first k in [0, steps) where the
    sample leaves the grid (break) or exceeds isoVal (hit).

    Vectorized: per while-round, gather `chunk` samples for every ray and
    resolve first-stop with an argmax. Early-exits when every ray stopped.

    Returns (hit (N,) bool, hit_k (N,) int32, hit_v (N,) int32).
    """
    n = p0.shape[0]
    n_chunks = -(-steps // chunk)
    iso = _I32(opts.isoVal)
    ks_rel = jnp.arange(chunk, dtype=_I32)

    def cond(c):
        return (c[0] < n_chunks) & jnp.any(c[1])

    def body(c):
        i, act, hit, hit_k, hit_v = c
        ks = i * chunk + ks_rel  # (chunk,)
        valid_k = ks < steps
        ps = p0[:, None, :] + delta[:, None, :] * ks[None, :, None].astype(_F32)
        v = voxel_lookup(vol, opts, ps)  # (N, chunk) int32, -1 OOB
        stop = ((v < 0) | (v > iso)) & valid_k[None, :]
        any_stop = jnp.any(stop, axis=1)
        first = jnp.argmax(stop, axis=1)  # (N,) first stop in chunk
        v_first = jnp.take_along_axis(v, first[:, None], axis=1)[:, 0]
        newly = act & any_stop
        is_hit = v_first > iso
        return (
            i + 1,
            act & ~any_stop,
            jnp.where(newly, is_hit, hit),
            jnp.where(newly, i * chunk + first, hit_k),
            jnp.where(newly, v_first, hit_v),
        )

    init = (
        _I32(0),
        active,
        jnp.zeros((n,), bool),
        jnp.zeros((n,), _I32),
        jnp.full((n,), -1, _I32),
    )
    _, _, hit, hit_k, hit_v = jax.lax.while_loop(cond, body, init)
    return hit, hit_k, hit_v


def distance_to_scene(vol, opts, rpos, rdir, steps, active, chunk=MARCH_CHUNK):
    """Scene distance = ground plane U voxel volume
    (reference: renderer.cl:209-237).

    Returns dict:
      dist (N,)      signed scene distance
      mat  (N,)      material id as float (ground quirk: its own distance)
      hit  (N,) bool inner march hit a voxel
      q    (N,3)     hit voxel coord (valid where hit)
      gd   (N,)      ground distance (for the deferred normal)
    Normals are NOT computed here — see `isec_normal`.
    """
    gd = rpos[:, 1] + opts.groundY
    # distUnion((gd, gd), (1e5, -1)) — scalar float2 broadcast makes the
    # ground's "material" its own distance (renderer.cl:211)
    res_d, res_m = dist_union(gd, gd, jnp.full_like(gd, 1e5), jnp.full_like(gd, -1.0))

    idist = intersects_box(opts.voxelBoundsMin, opts.voxelBoundsMax, rpos, rdir)
    march_mask = active & (idist >= 0.0) & (idist < res_d)

    delta = rdir / (steps * 0.5) * opts.invVoxelScale
    p0 = rpos + opts.voxelBounds
    p0 = jnp.where((idist > 0.0)[:, None], p0 + rdir * idist[:, None], p0)
    p0 = p0 * opts.invVoxelScale

    hit, hit_k, hit_v = march_volume(vol, opts, p0, delta, steps, march_mask, chunk)
    hit_p = p0 + delta * hit_k[:, None].astype(_F32)
    q = voxel_coord(opts, hit_p)
    world = hit_p * opts.voxelBounds2 - opts.voxelBounds
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


def isec_normal(vol, opts, sd, rdir, smooth):
    """Deferred normal for a distance_to_scene result
    (reference: renderer.cl:212 ground/backstop, :225-229 voxel gradient)."""
    ground_n = jnp.where(
        (sd["gd"] < 1e5)[:, None],
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], _F32), rdir.shape),
        -rdir,
    )
    if smooth:
        vn = voxel_normal_smooth(vol, opts, sd["q"])
    else:
        vn = voxel_normal_fast(vol, opts, sd["q"])
    return jnp.where(sd["hit"][:, None], vn, ground_n)


@partial(jax.named_call, name="raymarch")
def raymarch(
    vol,
    opts,
    ray_pos,
    ray_dir,
    max_dist,
    max_steps,
    smooth,
    active,
    want_normal=True,
    chunk=MARCH_CHUNK,
):
    """Sphere-trace loop (reference: renderer.cl:239-257).

    max_dist may be scalar or per-ray (N,). max_steps/smooth/want_normal are
    static. Returns dict isec {pos, distance, object_id, normal?}.

    The loop keeps the reference's structure: each round re-marches the
    volume from the current position (renderer.cl:245); rounds stop when all
    rays have converged (|d| <= eps), escaped (>= max_dist), or the step
    budget runs out; misses are rewritten to objectID=-1 / distance=1000
    (renderer.cl:252-256). Normals resolve once post-loop from the tracked
    hit voxel instead of once per round.
    """
    n = ray_pos.shape[0]
    max_dist = jnp.broadcast_to(jnp.asarray(max_dist, _F32), (n,))

    carry = {
        "step": _I32(0),
        "active": active,
        "dist": jnp.broadcast_to(opts.startDist, (n,)).astype(_F32),
        "obj": jnp.zeros((n,), _I32),
        "pos": ray_pos,
        "hit": jnp.zeros((n,), bool),
        "q": jnp.zeros((n, 3), _I32),
        "gd": jnp.zeros((n,), _F32),
    }

    def cond(c):
        return (c["step"] < max_steps) & jnp.any(c["active"])

    def body(c):
        a = c["active"]
        pos = ray_pos + ray_dir * c["dist"][:, None]
        sd = distance_to_scene(vol, opts, pos, ray_dir, opts.maxVoxelIter, a, chunk)
        done = (jnp.abs(sd["dist"]) <= opts.eps) | (c["dist"] >= max_dist)
        return {
            "step": c["step"] + 1,
            "active": a & ~done,
            "dist": jnp.where(a & ~done, c["dist"] + sd["dist"], c["dist"]),
            "obj": jnp.where(a, sd["mat"].astype(_I32), c["obj"]),
            "pos": jnp.where(a[:, None], pos, c["pos"]),
            "hit": jnp.where(a, sd["hit"], c["hit"]),
            "q": jnp.where(a[:, None], sd["q"], c["q"]),
            "gd": jnp.where(a, sd["gd"], c["gd"]),
        }

    c = jax.lax.while_loop(cond, body, carry)

    miss = c["dist"] >= max_dist
    isec = {
        "pos": jnp.where(miss[:, None], ray_pos + ray_dir * c["dist"][:, None], c["pos"]),
        "distance": jnp.where(miss, 1000.0, c["dist"]),
        "object_id": jnp.where(miss, -1, c["obj"]),
    }
    if want_normal:
        sd = {"hit": c["hit"] & ~miss, "q": c["q"], "gd": c["gd"]}
        isec["normal"] = isec_normal(vol, opts, sd, ray_dir, smooth)
    return isec
