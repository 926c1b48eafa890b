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

# Brick-probe applications unrolled per while_loop round of the nested
# march (amortizes round overhead; each application is one (N, 64) row
# gather + BRICK_SUBSTEPS vectorized bit tests).
DIST_UNROLL = 2

_I32 = jnp.int32
_F32 = jnp.float32


def _carry_vma(tree, ref):
    """Promote every leaf of a while_loop init carry to the varying manual
    axes of `ref`.

    Under jax.shard_map's varying-manual-axes analysis (check_vma=True),
    carries initialized from constants (jnp.zeros etc.) are 'unvarying'
    while the loop body's outputs — which depend on per-shard ray state —
    are varying, and while_loop requires the two to match. pcast-ing the
    constants to the reference's vma is a type-level change only (values
    untouched). No-op outside shard_map (vma is empty) and on leaves that
    already carry the axes."""
    ref_vma = getattr(jax.typeof(ref), "vma", None)
    if not ref_vma:
        return tree

    def fix(x):
        missing = ref_vma - jax.typeof(x).vma
        return jax.lax.pcast(x, tuple(missing), to="varying") if missing else x

    return jax.tree_util.tree_map(fix, tree)


def dist_union(d1, m1, d2, m2):
    """distUnion (reference: renderer.cl:146-148): pick the pair with the
    strictly smaller distance (ties -> second arg)."""
    take1 = d1 < d2
    return jnp.where(take1, d1, d2), jnp.where(take1, m1, m2)


def _fmin(a, b):
    """OpenCL fmin: NaN-suppressing minimum (returns the non-NaN operand).
    XLA's jnp.minimum is select-based and asymmetric on NaN, so guard
    explicitly."""
    return jnp.where(
        jnp.isnan(a), b, jnp.where(jnp.isnan(b), a, jnp.minimum(a, b))
    )


def _fmax(a, b):
    return jnp.where(
        jnp.isnan(a), b, jnp.where(jnp.isnan(b), a, jnp.maximum(a, b))
    )


def intersects_box(bmin, bmax, p: V3, d: V3):
    """Slab test (reference: renderer.cl:153-161). Returns entry distance or
    -1.0 where the ray misses. bmin/bmax: python/np 3-sequences.

    Zero direction components divide to ±inf (and 0/0 -> NaN when the ray
    starts exactly on a slab plane), resolved by NaN-suppressing
    fmin/fmax — exactly the reference's IEEE semantics. (An earlier
    version substituted 1e-30 for zero components, which classified rays
    starting exactly on a slab boundary differently.)"""
    a = jnp.zeros_like(p.x)
    b = None
    for c in range(3):
        dc = (d.x, d.y, d.z)[c]
        pc = (p.x, p.y, p.z)[c]
        o1 = (bmin[c] - pc) / dc
        o2 = (bmax[c] - pc) / dc
        lo = _fmin(o1, o2)
        hi = _fmax(o1, o2)
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


def _take_flat(arr, idx, mode="clip"):
    """1-D table gather with multi-dim lane indices flattened: keeps the
    gather's start indices 1-D (the fast emitter form; a 2-D-start-index
    gather costs ~100 us/round more at 4096 lanes, PERFORMANCE.md)."""
    if idx.ndim == 1:
        return jnp.take(arr, idx, mode=mode)
    return jnp.take(arr, idx.reshape(-1), mode=mode).reshape(idx.shape)


def voxel_fetch(vol, opts, q: V3):
    """Bounds-checked byte fetch at integer coords -> (value int32 with -1
    OOB, valid mask). The gather itself is uint8 (minimal HBM traffic)."""
    valid, idx = _bounds_and_index(opts, q)
    v = _take_flat(vol, idx).astype(_I32)
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
    v = _take_flat(vol, idx)
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


def _occ5_superbrick(accel, opts, q: V3):
    """(5, 5, 5, N) occupancy block around q from ONE row gather: brick
    b = q >> 3's 12^3 occupancy window covers [q-2, q+2]^3 for every q in b
    (accel.Accel.nrm_rows), so the gather stages all 125 bits and pure
    vector ops extract them. Values identical to the byte path
    (occupancy_i semantics incl. bounds: out-of-grid voxels read 0).
    Axis order: [dx, dy, dz, ray].

    The window table covers a +1-brick ring around the grid, so q up to 8
    voxels outside still resolves its (possibly grid-straddling)
    neighborhood exactly; farther q gets an all-zero row — also exact
    (every neighborhood voxel is out-of-grid, occupancy 0)."""
    from .accel import NRM_ROW_WORDS, nrm_dims

    # fixed 8-stride window grid, independent of the march BRICK
    nbx, nby, nbz = nrm_dims(opts.voxelRes)
    ex, ey, ez = (q.x >> 3) + 1, (q.y >> 3) + 1, (q.z >> 3) + 1
    inb = (
        (ex >= 0) & (ex < nbx + 2)
        & (ey >= 0) & (ey < nby + 2)
        & (ez >= 0) & (ez < nbz + 2)
    )
    bid = jnp.where(inb, (ez * (nby + 2) + ey) * (nbx + 2) + ex, 0)
    row = _gather_rows(accel.nrm_rows, accel.nrm_mxu, bid, NRM_ROW_WORDS)
    row = jnp.where(inb[..., None], row, jnp.uint32(0))

    u0x = (q.x & 7).astype(jnp.uint32)  # window coord of q-2 per axis
    u0y, u0z = q.y & 7, q.z & 7
    occ = [[[None] * 5 for _ in range(5)] for _ in range(5)]  # [dx][dy][dz]
    for k in range(5):  # dz offset
        for j in range(5):  # dy offset
            base = ((u0z + k) * 12 + (u0y + j)) * 12 + u0x.astype(_I32)
            w1 = base >> 5
            sh = (base & 31).astype(jnp.uint32)
            # w1 <= 53 and w1+1 <= 54 < NRM_ROW_WORDS = 56, so both reads
            # are in-row (the last two words are zero padding); the select
            # tree and the one-hot sum agree everywhere (test_march)
            word1 = _word_at(row, w1)
            word2 = _word_at(row, w1 + 1)
            hi = jnp.where(
                sh > jnp.uint32(0), word2 << (jnp.uint32(32) - sh), jnp.uint32(0)
            )
            bits = (word1 >> sh) | hi  # bit i = occupancy at x = qx - 2 + i
            for i in range(5):
                occ[i][j][k] = ((bits >> jnp.uint32(i)) & 1).astype(_F32)
    return jnp.stack(
        [jnp.stack([jnp.stack(c, axis=0) for c in p], axis=0) for p in occ], axis=0
    )


def voxel_normal_smooth(vol, opts, q: V3, accel=None) -> V3:
    """Sum of gradient normals over the occupied 3x3x3 neighborhood,
    normalized (reference: renderer.cl:190-203).

    One (125, N) occupancy gather, or ONE 12^3-window row gather + vector
    bit extraction when the accel is available (_occ5_superbrick);
    gradients by shifted slicing of the (5, 5, 5, N) occupancy block.
    """
    if accel is not None:
        occ = _occ5_superbrick(accel, opts, q)  # [dx, dy, dz, ray...]
    else:
        off = lambda o: jnp.asarray(o).reshape((125,) + (1,) * q.x.ndim)
        qq = V3(
            q.x[None] + off(_OX5),
            q.y[None] + off(_OY5),
            q.z[None] + off(_OZ5),
        )
        occ = occupancy_i(vol, opts, qq).reshape((5, 5, 5) + q.x.shape)
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
    * accel=ops.accel.Accel: brick-driven. Each landing gathers its 8^3
      brick ROW (one row gather ~ one element gather on this platform);
      staged STOP bits answer up to BRICK_SUBSTEPS consecutive samples with
      vector ops, and the brick-level Chebyshev distance licenses provably
      safe multi-sample skips across free space (see ops/accel.py and
      _brick_probe). Gathered rows = brick crossings, not samples.

    `max_k` truncates the EVALUATED portion of the budget without changing
    the step length (delta still derives from `steps`): samples k >= max_k
    are treated as not reached. Callers use it where results are provably
    insensitive to hits beyond max_k (see shade.ambient_occlusion).
    `max_k_dyn` is the same cap per-ray as an (N,) int32 array (see
    raymarch's shadow truncation).
    """
    if accel is not None:
        return _march_volume_brick(
            opts, accel, p0, delta, steps, active, max_k=max_k, max_k_dyn=max_k_dyn
        )
    if p0.x.ndim != 1:
        raise ValueError(
            "stacked (N, P) lanes require the brick accel engine"
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

    init = _carry_vma(
        (
            _I32(0),
            active,
            jnp.zeros((n,), _I32),
            jnp.zeros((n,), bool),
            jnp.zeros((n,), _I32),
        ),
        p0.x,
    )
    _, _, _, hit, hit_k = jax.lax.while_loop(cond, body, init)
    return hit, hit_k


def _word_at(words, idx):
    """words: (..., W) uint32, idx: (...,) int32 — words[lane, idx[lane]]
    as a one-hot compare+sum (0 where idx >= W). Exact; lane dims are
    trailing-generic: (N,) or (N, P) for stacked trailing lanes.

    Deliberately NOT a binary select tree: ops on (N, W<=128) cost the same
    as on (N,) — the trailing dim rides the 128-lane axis — so the one-hot's
    3 wide ops beat a tree's ~15 narrow dependent selects (measured
    6.81 s -> 17.88 s on v5e, PERFORMANCE.md round-3)."""
    iota = jnp.arange(words.shape[-1], dtype=_I32)
    return jnp.sum(
        jnp.where(iota == idx[..., None], words, jnp.uint32(0)), axis=-1
    )


def _mxu_rows(table_mxu, bid, n_words):
    """Row gather as a one-hot matmul on the MXU (EXACT — see
    accel.ONEHOT_MAX_ROWS): onehot(bid) @ byte_planes, then reassemble
    u32 words from the four byte columns. bid must be pre-clipped.
    bid: (...,) — lane dims flatten through the matmul."""
    nb = table_mxu.shape[0]
    bid_f = bid.reshape(-1)
    oh = (bid_f[:, None] == jnp.arange(nb, dtype=bid.dtype)[None, :]).astype(
        jnp.float32
    )
    b = oh @ table_mxu  # (L, 4*n_words); one nonzero per sum -> exact
    b = b.reshape(bid.shape + (n_words, 4)).astype(jnp.uint32)
    return (
        b[..., 0]
        | (b[..., 1] << 8)
        | (b[..., 2] << 16)
        | (b[..., 3] << 24)
    )


def _gather_rows(accel_rows, accel_mxu, bid, n_words):
    """March/normal row fetch: MXU one-hot path for small tables, XLA take
    otherwise. bid: (...,) int32 -> (..., n_words) rows (flatten/reshape
    keeps the gather's start indices 1-D — the fast emitter form)."""
    if accel_mxu is not None:
        return _mxu_rows(accel_mxu, bid, n_words)
    if bid.ndim == 1:
        return jnp.take(accel_rows, bid, axis=0, mode="clip")
    rows = jnp.take(accel_rows, bid.reshape(-1), axis=0, mode="clip")
    return rows.reshape(bid.shape + (accel_rows.shape[1],))


def _probe_landing(opts, p0: V3, delta: V3, k, edge):
    """Landing-sample coordinates of one brick application: integer voxel
    coord validity, brick coords and brick row id (0 where invalid).
    `edge` is the brick edge the ACCEL TABLE was built at (Accel.edge) —
    never the module global, so a table cannot be mis-decoded."""
    from .accel import brick_dims

    shift = edge.bit_length() - 1
    nbx, nby, _ = brick_dims(opts.voxelRes, edge)
    kf = k.astype(_F32)
    p = V3(p0.x + delta.x * kf, p0.y + delta.y * kf, p0.z + delta.z * kf)
    q = voxel_coord(opts, p)
    valid, _ = _bounds_and_index(opts, q)
    bx, by, bz = q.x >> shift, q.y >> shift, q.z >> shift
    bid = jnp.where(valid, (bz * nby + by) * nbx + bx, 0)
    return valid, bx, by, bz, bid


def _brick_probe(opts, accel, p0: V3, delta: V3, k, act, cap, inv_vps):
    """One brick application of the fixed-step march (see ops/accel.py).

    Gathers the landing sample's brick row (ONE row gather — the march's
    only memory access), then resolves the lane with pure vector ops
    (_probe_resolve):

    * landing out-of-bounds -> break (ends, no hit);
    * brick distance D >= 2 -> the landing is provably not a hit and the
      next floor((8D-7-SKIP_SLACK)*inv_vps) samples are provably safe:
      advance 1 + skip without testing (exactness: ops/accel.py);
    * otherwise up to BRICK_SUBSTEPS consecutive samples are tested against
      the staged STOP bitplane: first set bit -> hit, out-of-bounds -> break,
      leaving the brick or exhausting the unroll -> continue next
      application from that sample.

    Per-sample semantics are EXACTLY the plain march's (every tested or
    skipped sample is accounted for in order; budget-exhausted lanes end
    with hit=False and hit_k untouched). Caller invariant: active lanes
    have k < cap.

    Returns dict:
      ended  — lane finished with a stop (hit or break) at k_end
      hit    — stop was a hit (subset of ended)
      k_end  — stopping sample index (valid where ended)
      dead   — lane finished by budget exhaustion (no stop recorded)
      cont   — lane continues next application at k_next (< cap)
      k_next — next landing for cont lanes
    """
    valid, bx, by, bz, bid = _probe_landing(opts, p0, delta, k, accel.edge)
    # (N, ROW_WORDS) with ROW_WORDS = edge^3/32 + 2 (18 at the default 8^3)
    rows = _gather_rows(accel.rows, accel.rows_mxu, bid, accel.rows.shape[1])
    return _probe_resolve(
        opts, rows, p0, delta, k, act, cap, inv_vps, valid, bx, by, bz,
        accel.edge,
    )


def _probe_resolve(opts, rows, p0: V3, delta: V3, k, act, cap, inv_vps,
                   valid, bx, by, bz, edge):
    """Row-content half of a brick application (see _brick_probe): given
    the landing's brick row, resolve skip/substep/stop events with pure
    vector ops. `edge` is the table's Accel.edge; the row layout (STOP
    words, distance word) is derived from it, never from the module
    globals."""
    from .accel import BRICK_SUBSTEPS, SKIP_SLACK, STOP_W0

    # workload-class substep depth (see SUBSTEPS_REFLECTIVE)
    substeps = SUBSTEPS_REFLECTIVE if opts.reflectIter > 0 else BRICK_SUBSTEPS
    shift = edge.bit_length() - 1
    mask = edge - 1
    dist_w = edge**3 // 32  # STOP words precede the distance word
    assert rows.shape[-1] == dist_w + 2, (rows.shape, edge)

    # two voxels in bricks at brick-Chebyshev D are at voxel-Chebyshev
    # >= edge*D - (edge-1)
    d_equiv = float(edge) * rows[..., dist_w].astype(_F32) - float(edge - 1)
    # clip keeps the f32->i32 cast in-range (inv_vps can be 1e30 for
    # degenerate rays; 2^30 steps is "past any budget" either way)
    skip = jnp.clip((d_equiv - SKIP_SLACK) * inv_vps, 0.0, 2.0**30).astype(_I32)

    stopw = rows[..., STOP_W0:dist_w]  # (..., edge^3/32)

    if WIDE_SUBSTEPS:
        return _resolve_substeps_wide(
            opts, stopw, p0, delta, k, act, cap, skip, valid,
            bx, by, bz, edge, substeps,
        )

    brk = act & ~valid  # landing itself out of grid
    hit = jnp.zeros(k.shape, bool)
    dead = jnp.zeros(k.shape, bool)
    k_end = jnp.where(brk, k, 0)
    k_exit = k
    pend = act & valid & (skip == 0)
    for i in range(substeps):
        ki = k + i
        kfi = ki.astype(_F32)
        pi = V3(p0.x + delta.x * kfi, p0.y + delta.y * kfi, p0.z + delta.z * kfi)
        qi = voxel_coord(opts, pi)
        vi, _ = _bounds_and_index(opts, qi)
        in_b = ki < cap
        same = (
            vi
            & ((qi.x >> shift) == bx)
            & ((qi.y >> shift) == by)
            & ((qi.z >> shift) == bz)
        )
        li = ((qi.z & mask) * edge + (qi.y & mask)) * edge + (qi.x & mask)
        word = _word_at(stopw, li >> 5)
        bit = ((word >> (li & 31).astype(jnp.uint32)) & 1) == 1
        ev_dead = pend & ~in_b
        ev_brk = pend & in_b & ~vi
        ev_hit = pend & in_b & vi & same & bit
        ev_exit = pend & in_b & vi & ~same
        hit = hit | ev_hit
        brk = brk | ev_brk
        dead = dead | ev_dead
        k_end = jnp.where(ev_hit | ev_brk, ki, k_end)
        k_exit = jnp.where(ev_exit, ki, k_exit)
        pend = pend & in_b & vi & same & ~bit
    k_exit = jnp.where(pend, k + substeps, k_exit)  # unroll out: re-gather

    ended = hit | brk
    k_next = jnp.where(act & valid & (skip > 0), k + 1 + skip, k_exit)
    cont = act & valid & ~ended & ~dead
    dead = dead | (cont & (k_next >= cap))
    cont = cont & (k_next < cap)
    return {
        "ended": ended,
        "hit": hit,
        "k_end": k_end,
        "dead": dead,
        "cont": cont,
        "k_next": k_next,
    }


def _prefix_and_excl(go):
    """Exclusive prefix-AND along the trailing axis: out[..., i] =
    AND_{j<i} go[..., j] (out[..., 0] = True). Log-doubling with
    pad-and-slice shifts — straight-line ops only (no scan: extra program
    regions inside a while body cost more than the ops they save,
    PERFORMANCE.md). Lane dims are leading-generic ((N, S) or (N, P, S))."""
    s = go.shape[-1]
    p = jnp.concatenate([jnp.ones_like(go[..., :1]), go[..., :-1]], axis=-1)
    sh = 1
    while sh < s:
        p = p & jnp.concatenate(
            [jnp.ones_like(p[..., :sh]), p[..., :-sh]], axis=-1
        )
        sh *= 2
    return p


def _select_f32(mask, vals):
    """Exact one-hot f32 select along the trailing axis: sum the uint32 BIT
    PATTERNS under the mask (at most one lane true per row). Unlike a float
    masked sum this is exact for -0.0 and NaN payloads; rows with no true
    lane yield +0.0 (callers gate those with a jnp.where)."""
    bits = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    sel = jnp.sum(
        jnp.where(mask, bits, jnp.uint32(0)), axis=-1, dtype=jnp.uint32
    )
    return jax.lax.bitcast_convert_type(sel, jnp.float32)


def _resolve_substeps_wide(opts, stopw, p0, delta, k, act, cap, skip, valid,
                           bx, by, bz, edge, substeps):
    """Batched-substep half of _probe_resolve (WIDE_SUBSTEPS): evaluate all
    `substeps` sample tests as (N, S) lanes in one straight-line block, then
    recover the serial loop's first-event semantics with an exclusive
    prefix-AND. Per-element float/int expressions are identical to the
    serial loop's (same primitive per element), and at most ONE substep per
    lane carries an event (the serial `pend` dies at the first event, and
    pend_i here includes the same prefix), so masked sums select exactly
    the serial k_end/k_exit. Bit-equal by construction; asserted by
    tests/test_accel.py::test_wide_substeps_bit_equal and on TPU by
    scripts/tpu_invariants.py (wide_substeps_on_off). Lane dims are
    leading-generic: (N,) or stacked (N, P) — the substep axis is appended
    trailing either way ((N, S) / (N, P, S))."""
    shift = edge.bit_length() - 1
    mask = edge - 1
    i = jnp.arange(substeps, dtype=_I32)
    ki = k[..., None] + i  # (..., S)
    kfi = ki.astype(_F32)
    pi = V3(
        p0.x[..., None] + delta.x[..., None] * kfi,
        p0.y[..., None] + delta.y[..., None] * kfi,
        p0.z[..., None] + delta.z[..., None] * kfi,
    )
    qi = voxel_coord(opts, pi)  # elementwise -> (..., S)
    vi, _ = _bounds_and_index(opts, qi)
    in_b = ki < cap[..., None]
    same = (
        vi
        & ((qi.x >> shift) == bx[..., None])
        & ((qi.y >> shift) == by[..., None])
        & ((qi.z >> shift) == bz[..., None])
    )
    li = ((qi.z & mask) * edge + (qi.y & mask)) * edge + (qi.x & mask)
    iota = jnp.arange(stopw.shape[-1], dtype=_I32)
    word = jnp.sum(
        jnp.where(iota == (li >> 5)[..., None], stopw[..., None, :],
                  jnp.uint32(0)),
        axis=-1,
    )  # (..., S) — the serial loop's _word_at, batched
    bit = ((word >> (li & 31).astype(jnp.uint32)) & 1) == 1

    go = in_b & vi & same & ~bit  # the serial pend survives this substep
    pend0 = act & valid & (skip == 0)
    pend_i = pend0[..., None] & _prefix_and_excl(go)  # (..., S) serial pend_i
    ev_dead = pend_i & ~in_b
    ev_brk = pend_i & in_b & ~vi
    ev_hit = pend_i & in_b & vi & same & bit
    ev_exit = pend_i & in_b & vi & ~same
    stop_i = ev_hit | ev_brk  # <= one true per lane (pend dies at events)

    brk0 = act & ~valid  # landing itself out of grid
    hit = jnp.any(ev_hit, axis=-1)
    brk = brk0 | jnp.any(ev_brk, axis=-1)
    dead = jnp.any(ev_dead, axis=-1)
    k_end = jnp.where(brk0, k, jnp.sum(jnp.where(stop_i, ki, 0), axis=-1))
    has_exit = jnp.any(ev_exit, axis=-1)
    k_exit = jnp.where(has_exit, jnp.sum(jnp.where(ev_exit, ki, 0), axis=-1), k)
    ran_out = pend0 & jnp.all(go, axis=-1)  # unroll out: re-gather
    k_exit = jnp.where(ran_out, k + substeps, k_exit)

    ended = hit | brk
    k_next = jnp.where(act & valid & (skip > 0), k + 1 + skip, k_exit)
    cont = act & valid & ~ended & ~dead
    dead = dead | (cont & (k_next >= cap))
    cont = cont & (k_next < cap)
    return {
        "ended": ended,
        "hit": hit,
        "k_end": k_end,
        "dead": dead,
        "cont": cont,
        "k_next": k_next,
    }


def _march_volume_brick(opts, accel, p0: V3, delta: V3, steps, active, max_k=None, max_k_dyn=None):
    """Brick-driven fixed-step march (see march_volume + _brick_probe):
    gathered rows per ray are proportional to brick crossings + landings
    near geometry, not to fixed-step samples. Budget-exhausted rays report
    hit=False exactly like the plain path."""
    from .accel import skips_per_distance

    eff = steps if max_k is None else min(steps, max_k)
    shp = p0.x.shape
    inv_vps = skips_per_distance(opts, delta)  # lane-shaped f32
    cap = jnp.full(shp, eff, _I32)
    if max_k_dyn is not None:
        cap = jnp.minimum(cap, max_k_dyn)

    def probe_step(act, k, hit, hit_k):
        ev = _brick_probe(opts, accel, p0, delta, k, act, cap, inv_vps)
        hit = jnp.where(ev["ended"], ev["hit"], hit)
        hit_k = jnp.where(ev["ended"], ev["k_end"], hit_k)
        return ev["cont"], ev["k_next"], hit, hit_k

    def cond(c):
        return jnp.any(c[0])

    def body(c):
        act, k, hit, hit_k = c
        for _ in range(DIST_UNROLL):
            act, k, hit, hit_k = probe_step(act, k, hit, hit_k)
        return act, k, hit, hit_k

    init = _carry_vma(
        (
            active & (cap > 0),
            jnp.zeros(shp, _I32),
            jnp.zeros(shp, bool),
            jnp.zeros(shp, _I32),
        ),
        p0.x,
    )
    _, _, hit, hit_k = jax.lax.while_loop(cond, body, init)
    return hit, hit_k


def distance_to_scene(vol, opts, rpos: V3, rdir: V3, steps, active, chunk=None, accel=None, idist=None, max_k=None, max_k_dyn=None, want_material=True):
    """Scene distance = ground plane U voxel volume
    (reference: renderer.cl:209-237).

    Returns dict: dist (N,), mat (N,) float (ground quirk: its own
    distance), hit (N,) bool, q (V3 int hit voxel coords), gd (N,).
    Normals are NOT computed here — see `isec_normal`.

    want_material=False skips the value re-fetch at the hit voxel (one
    element gather); `mat` is then NOT meaningful — callers must consume
    only `dist` (ambient_occlusion does). `dist` is unaffected: distUnion's
    distance branch never reads the material lane.
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
    vb2 = _np3(opts.voxelBounds2)
    world = V3(hit_p.x * vb2[0] - vb[0], hit_p.y * vb2[1] - vb[1], hit_p.z * vb2[2] - vb[2])
    vdist = norm(rpos - world) - opts.voxelSize
    if want_material:
        hit_v, _ = voxel_fetch(vol, opts, q)  # re-fetch value at hit (N,)
        vmat = voxel_material(hit_v)
    else:
        vmat = res_m  # placeholder: `mat` not meaningful (docstring)

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


def isec_normal(vol, opts, hit, q, gd, rdir: V3, smooth, accel=None):
    """Deferred normal for a distance_to_scene / raymarch result
    (reference: renderer.cl:212 ground/backstop, :225-229 voxel gradient)."""
    ground_n = where3(
        gd < 1e5, V3.const((0.0, 1.0, 0.0), like=rdir), -rdir
    )
    if smooth:
        vn = voxel_normal_smooth(vol, opts, q, accel=accel)
    else:
        vn = voxel_normal_fast(vol, opts, q)
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
    want_stats=False,
    want_object=True,
):
    """Sphere-trace loop (reference: renderer.cl:239-257).

    max_dist may be scalar or per-ray (N,). max_steps/smooth/want_normal are
    static. Returns dict isec {pos: V3, distance, object_id, normal?: V3}.

    Per-ray semantics keep the reference's loop structure: each round
    re-marches the volume from the current position (renderer.cl:245);
    rounds stop when the ray converged (|d| <= eps), escaped (>= max_dist),
    or the budget ran out; misses rewrite to objectID=-1 / distance=1000
    (renderer.cl:252-256). Normals resolve once post-loop from the tracked
    hit voxel.

    Two schedulings of the identical per-ray computation (bit-equal,
    tests/test_accel.py):

    * accel=None: nested loops — an outer sphere-trace while_loop whose body
      runs the chunked march_volume to completion each round. Every lane
      waits for the band's slowest inner march every round.
    * accel=Accel: `_raymarch_flat` — a single while_loop over a per-lane
      state machine (SETUP/MARCH/GROUND/BOOK/DONE); each lane flows through
      its own probe steps, sphere transitions and ground steps continuously,
      so a band pays max-over-rays of TOTAL probes instead of
      sum-over-rounds of per-round maxima.

    With truncate_to_max_dist=True (used for shadow rays, whose only
    consumer is `distance >= light_max_dist`), each round's volume march is
    capped per-ray at the steps that could still place a hit within
    max_dist (+eps +voxelSize margin). Output-identical proof: a hit
    farther than the remaining distance either loses distUnion to the
    ground term (same sd either way) or overshoots max_dist (same
    miss-fixup either way); shadow() never reads normals/object ids.

    want_object=False (flat engine) skips the deferred per-ray hit-material
    fetch; object_id is then only a ground-quirk value, NOT the voxel
    material — callers must consume only `distance` (shadow does).

    Ground-tail fast path: rays whose LINE misses the voxel box
    (intersectsBox < 0 — permanent once true) have a purely scalar scene
    distance (the ground plane), so instead of one sphere-trace step per
    round they iterate GROUND_STEPS (flat: FLAT_GROUND_STEPS per
    application) steps of the exact same recurrence in cheap unrolled (N,)
    math — replicating the reference's per-step ops bit-for-bit while
    collapsing the long convergence tail of grazing ground/sky rays.
    Per-ray step counters keep the maxIter budget exact.

    Lane shape is generic: (N,) flat lanes, or stacked (N, P) trailing-lane
    groups (P spp passes of the same pixels — ops/render.py pass stacking;
    flat/brick engine only). All per-lane math is elementwise, so each
    stacked lane computes bit-identically to its (N,) counterpart.
    """
    shp = ray_pos.x.shape
    max_dist = jnp.broadcast_to(jnp.asarray(max_dist, _F32), shp)
    if accel is not None:
        c = _raymarch_flat(
            accel, vol, opts, ray_pos, ray_dir, max_dist, max_steps, active,
            truncate_to_max_dist, want_object=want_object,
            # shadow configuration (no normals, no material): drop the
            # write-only carry arrays and their per-application updates —
            # XLA cannot dead-code-eliminate while_loop carries, so unused
            # outputs cost real vector work in every application. The march
            # event sequence and the distance evolution are untouched =>
            # `distance` (and apps) bit-equal to the full carry.
            lean=(not want_normal) and (not want_object),
        )
    else:
        c = _raymarch_nested(
            opts, vol, ray_pos, ray_dir, max_dist, max_steps, active, chunk,
            truncate_to_max_dist,
        )

    miss = c["dist"] >= max_dist
    isec = {
        "pos": where3(miss, ray_pos + ray_dir * c["dist"], c["pos"]),
        "distance": jnp.where(miss, 1000.0, c["dist"]),
        "object_id": jnp.where(miss, -1, c["obj"]),
    }
    if want_normal:
        isec["normal"] = isec_normal(
            vol, opts, c["hit"] & ~miss, c["q"], c["gd"], ray_dir, smooth,
            accel=accel,
        )
    if want_stats:  # scheduling diagnostics (scripts/profile_stages.py)
        isec["rounds"] = c["round"]  # while rounds paid (band worst-ray)
        isec["steps"] = c["s"]  # per-ray sphere steps consumed (useful work)
        isec["apps"] = c.get("apps", c["s"])  # per-lane applications (flat)
    return isec


def _raymarch_nested(
    opts, vol, ray_pos, ray_dir, max_dist, max_steps, active, chunk,
    truncate_to_max_dist,
):
    """Reference-structured scheduling of the sphere trace (see raymarch)."""
    n = ray_pos.x.shape[0]
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
            vol, opts, pos, ray_dir, opts.maxVoxelIter, slow, chunk,
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

    return jax.lax.while_loop(cond, body, _carry_vma(carry, ray_pos.x))


# Flat-engine lane modes. DONE must be 0 (cond tests mode != 0).
_M_DONE, _M_SETUP, _M_MARCH, _M_GROUND, _M_BOOK = 0, 1, 2, 3, 4

# State-machine applications unrolled per while round, and ground-only
# sphere steps executed per application for GROUND-mode lanes. Re-swept at
# the headline config under TILE_RAYS=4096 (scripts/bench_flat_sweep.py,
# v5e, bit-equal — grouping-only): unroll 4: 6.66 s, 8: 6.78 s, 16: 7.09 s.
# Finer unrolls waste fewer trailing lane-applications per band round now
# that bands are 4x bigger than when 8 was tuned.
FLAT_UNROLL = 4
FLAT_GROUND_STEPS = 4

# Wide substep resolve: batch _probe_resolve's BRICK_SUBSTEPS sample tests
# along a trailing (S,) axis instead of a python-unrolled serial loop. The
# platform cost model (PERFORMANCE.md round-3) is while-body time ~ op
# count x ~0.2 us ISSUE cost at any operand width <= (N, 128): the serial
# loop issues ~65 ops per substep (~390 for the block), the wide form
# issues the same ~65 elementwise ops ONCE on (N, S) operands plus a
# ~10-op prefix-AND/reduction epilogue. Per-element float expressions are
# identical (same ops, bigger shapes) and the event logic is exact boolean
# algebra over the same predicates, so outputs are bit-equal
# (tests/test_accel.py::test_wide_substeps_bit_equal; on-TPU:
# scripts/tpu_invariants.py wide_substeps_on_off). Default ON from the
# round-3 HW A/B: headline 6.66 s -> 4.92 s (-26%), bit-equal on v5e; the
# (substeps x edge) matrix re-sweep kept SUBSTEPS=6 / BRICK=8 (deeper
# substeps cut paid applications 0.75x offline but the extra trailing work
# nets out worse on HW: 12 -> 5.04 s, 16 -> 5.08 s; 16^3 bricks put the
# word-select at (N, S, 128) and lose big: 7.6-17.2 s). PERFORMANCE.md.
WIDE_SUBSTEPS = True

# Substep depth for REFLECTIVE presets (opts.reflectIter > 0 — a static
# opts field, so the choice is trace-time). History: the round-4 depth
# re-sweep split by workload class — bounce-free configs optimize at
# accel.BRICK_SUBSTEPS = 8 while the UNSTACKED reflective configs kept
# improving through 16 (config 4 at 4 spp: 6/8/12/16 -> 6.18/5.77/5.65/
# 5.40 s) because sparse secondary bands amortized deeper fetches. The
# round-5 per-lane POOLED stacked engine (render.STACK_REFLECTIVE)
# dissolved that split: pooled bands are dense again, and the config-4
# spec re-sweep (512^2/16spp, v5e, bit-equal — substep depth is
# output-exact by the prefix-AND first-event recovery) reads 6 -> 15.87,
# **8 -> 15.45**, 12 -> 16.11, 16 -> 16.30, 24 -> 17.46 s: the same
# depth-8 optimum as every other march class.
SUBSTEPS_REFLECTIVE = 8

# Wide ground block: batch the FLAT_GROUND_STEPS ground-mode steps the same
# way — the serial recurrence is only the ~5-op dist ladder; the ~90-op
# remainder (slab test + bookkeeping) evaluates once on (N, S) lanes
# (~free trailing dim per the cost model). Also changes the economics of
# FLAT_GROUND_STEPS depth: deeper ground unrolls retire more steps per
# application at near-constant body cost. Bit-equal
# (tests/test_accel.py::test_wide_ground_bit_equal; on-TPU:
# scripts/tpu_invariants.py wide_ground_on_off). Default ON from the
# round-3 HW A/B: headline 4.921 -> 4.804 s at depth 4. NOTE the win is
# ~2.4% where the op-count model predicted ~25% — the serial ground
# block's plain (N,) float ops are much cheaper per op than the substep
# loop's word-select/select chains, and deeper wide depths LOSE (8 ->
# 5.04 s, 16 -> 5.51 s) despite retiring more steps per application
# (PERFORMANCE.md round-3 session-3: the cost model is op-KIND-dependent).
WIDE_GROUND = True

def _raymarch_flat(
    accel, vol, opts, ray_pos, ray_dir, max_dist, max_steps, active,
    truncate_to_max_dist, want_object=True, lean=False,
):
    """Flattened scheduling of the sphere trace (see raymarch docstring).

    One while_loop over a per-lane state machine:

      SETUP  -> sphere-round prologue: ground distance, box test, march
                setup (p0/k/cap); branches to MARCH, GROUND or BOOK.
      MARCH  -> one brick application (_brick_probe): a single (18,) row
                gather stages the landing's 8^3 brick — STOP bits resolve up
                to BRICK_SUBSTEPS samples and the brick-level distance
                licenses provable multi-sample skips (ops/accel.py). The
                hit MATERIAL is deferred: one voxel_fetch per ray after
                the loop (want_object), not one per march event.
                On stop/budget-exhaustion, sphere bookkeeping runs in the
                same application and the lane returns to SETUP (or DONE).
      GROUND -> FLAT_GROUND_STEPS exact ground-only sphere steps per
                application (box re-entry exits to SETUP, no step consumed).
      BOOK   -> sphere round whose scene distance is the ground term only
                (box ahead but ground closer, or a zero march budget).

    Per-ray operation sequences (and so all float values) are identical to
    _raymarch_nested + the brick march; only lane scheduling differs —
    a lane never waits for the band's slowest inner march. Bit-equal
    (tests/test_accel.py).
    """
    from .accel import skips_per_distance

    shp = ray_pos.x.shape
    bmin = _np3(opts.voxelBoundsMin)
    bmax = _np3(opts.voxelBoundsMax)
    inv_s = _np3(opts.invVoxelScale)
    vb = _np3(opts.voxelBounds)
    vb2 = _np3(opts.voxelBounds2)
    steps = opts.maxVoxelIter
    scale = 1.0 / (steps * 0.5)
    delta = V3(
        ray_dir.x * scale * inv_s[0],
        ray_dir.y * scale * inv_s[1],
        ray_dir.z * scale * inv_s[2],
    )
    inv_vps = skips_per_distance(opts, delta)
    if truncate_to_max_dist:
        f_min = min(a * b for a, b in zip(inv_s, vb2))
        base_step = (2.0 / steps) * f_min
        inv_steplen = 1.0 / (base_step * jnp.maximum(norm(ray_dir), 1e-20))

    def _ground_res(pos):
        gd = pos.y + opts.groundY
        res_d, res_m = dist_union(
            gd, gd, jnp.full_like(gd, 1e5), jnp.full_like(gd, -1.0)
        )
        return gd, res_d, res_m

    def _setup(c):
        m = c["mode"] == _M_SETUP
        pos = ray_pos + ray_dir * c["dist"]
        gd, res_d, _ = _ground_res(pos)
        idist = intersects_box(bmin, bmax, pos, ray_dir)
        if truncate_to_max_dist:
            remaining = max_dist - c["dist"]
            cap_new = jnp.clip(
                (remaining + opts.eps + opts.voxelSize) * inv_steplen + 3.0,
                0.0,
                _F32(steps),
            ).astype(_I32)
        else:
            cap_new = jnp.full(shp, steps, _I32)
        to_ground = idist < 0.0
        to_march = (idist >= 0.0) & (idist < res_d) & (cap_new > 0)
        adv = jnp.where(idist > 0.0, idist, 0.0)
        p0 = V3(
            (pos.x + vb[0] + ray_dir.x * adv) * inv_s[0],
            (pos.y + vb[1] + ray_dir.y * adv) * inv_s[1],
            (pos.z + vb[2] + ray_dir.z * adv) * inv_s[2],
        )
        mode = jnp.where(
            m,
            jnp.where(
                to_ground,
                _I32(_M_GROUND),
                jnp.where(to_march, _I32(_M_MARCH), _I32(_M_BOOK)),
            ),
            c["mode"],
        )
        return {
            **c,
            "mode": mode,
            "k": jnp.where(m, 0, c["k"]),
            "cap": jnp.where(m, cap_new, c["cap"]),
            "p0": where3(m, p0, c["p0"]),
        }

    def _book(c, ev, attempted):
        """March-event bookkeeping shared by the gathered probe and the
        brick-cache fast rounds: sphere-round resolution for lanes whose
        march segment just ended (attempted & ~cont) and for BOOK-mode
        lanes (ground-term-only rounds), k-advance for cont lanes. `ev`
        may come from either row source — identical content either way."""
        march_end = attempted & ~ev["cont"]  # stop (hit/break) or budget out
        m_hit = ev["hit"]

        # stop-sample position/voxel (same f32 expression as the probe's)
        kf = ev["k_end"].astype(_F32)
        p = V3(
            c["p0"].x + delta.x * kf,
            c["p0"].y + delta.y * kf,
            c["p0"].z + delta.z * kf,
        )
        qc = None if lean else voxel_coord(opts, p)

        # scene-distance resolution + sphere bookkeeping for lanes whose
        # march just ended and for BOOK lanes (ground-term-only rounds)
        be = march_end | (c["mode"] == _M_BOOK)
        pos = ray_pos + ray_dir * c["dist"]
        gd, res_d, res_m = _ground_res(pos)
        world = V3(p.x * vb2[0] - vb[0], p.y * vb2[1] - vb[1], p.z * vb2[2] - vb[2])
        vdist = norm(pos - world) - opts.voxelSize
        # distUnion's d-branch; the material side is DEFERRED: a hit event
        # whose voxel term wins (take1) marks `ovox`, and the material —
        # voxelMaterial(vol[q]), identical to the reference's value-at-hit
        # (renderer.cl:205-207, 226) — is fetched ONCE per ray after the
        # loop instead of per march event. Every other event's obj is the
        # ground-quirk value res_m, written directly.
        take1 = vdist < res_d
        hd = jnp.where(take1, vdist, res_d)
        sd_d = jnp.where(m_hit, hd, res_d)
        done = (jnp.abs(sd_d) <= opts.eps) | (c["dist"] >= max_dist)
        s = jnp.where(be, c["s"] + 1, c["s"])
        fin = done | (s >= max_steps)
        out = {
            **c,
            "mode": jnp.where(
                be, jnp.where(fin, _I32(_M_DONE), _I32(_M_SETUP)), c["mode"]
            ),
            "s": s,
            "dist": jnp.where(be & ~done, c["dist"] + sd_d, c["dist"]),
            "k": jnp.where(ev["cont"], ev["k_next"], c["k"]),
        }
        if not lean:  # write-only outputs (normals/material/pos consumers)
            out["dist_prev"] = jnp.where(be, c["dist"], c["dist_prev"])
            out["obj"] = jnp.where(be, res_m.astype(_I32), c["obj"])
            out["ovox"] = jnp.where(be, m_hit & take1, c["ovox"])
            out["hit"] = jnp.where(be, m_hit, c["hit"])
            out["q"] = V3(
                jnp.where(be, qc.x, c["q"].x),
                jnp.where(be, qc.y, c["q"].y),
                jnp.where(be, qc.z, c["q"].z),
            )
            out["gd"] = jnp.where(be, gd, c["gd"])
        return out

    def _march_and_book(c):
        in_march = c["mode"] == _M_MARCH
        ev = _brick_probe(
            opts, accel, c["p0"], delta, c["k"], in_march, c["cap"], inv_vps
        )
        return _book(c, ev, in_march)

    def _ground(c):
        if WIDE_GROUND:
            return _ground_wide(c)
        # python-unrolled: each ground step is ~50 fused elementwise ops —
        # cheap to compile, while loop-carrying them would pay per-iteration
        # overhead on every state-machine step
        for _ in range(FLAT_GROUND_STEPS):
            g = c["mode"] == _M_GROUND
            pos = ray_pos + ray_dir * c["dist"]
            exit_ = g & (intersects_box(bmin, bmax, pos, ray_dir) >= 0.0)
            a = g & ~exit_
            gd, res_d, res_m = _ground_res(pos)
            done = (jnp.abs(res_d) <= opts.eps) | (c["dist"] >= max_dist)
            s = jnp.where(a, c["s"] + 1, c["s"])
            fin = done | (s >= max_steps)
            nc = {
                **c,
                "mode": jnp.where(
                    exit_,
                    _I32(_M_SETUP),
                    jnp.where(a & fin, _I32(_M_DONE), c["mode"]),
                ),
                "s": s,
                "dist": jnp.where(a & ~done, c["dist"] + res_d, c["dist"]),
            }
            if not lean:  # write-only outputs
                nc["dist_prev"] = jnp.where(a, c["dist"], c["dist_prev"])
                nc["obj"] = jnp.where(a, res_m.astype(_I32), c["obj"])
                nc["ovox"] = jnp.where(a, False, c["ovox"])
                nc["hit"] = jnp.where(a, False, c["hit"])
                nc["gd"] = jnp.where(a, gd, c["gd"])
            c = nc
        return c

    def _ground_wide(c):
        """Batched ground block (WIDE_GROUND): the serial loop's only true
        recurrence is the dist ladder — dist_{i+1} = dist_i + res_d_i with
        res_d_i a ~5-op function of dist_i — so run THAT serially
        (identical per-element expressions) and evaluate everything else
        (slab test, done/fin bookkeeping) once on (N, S) lanes, recovering
        the serial first-event semantics with an exclusive prefix-AND as in
        _resolve_substeps_wide. Event order per step matches the serial
        loop: box re-entry (exit -> SETUP, no step consumed) is checked
        before fin (-> DONE, step consumed). Float selects go through
        uint32 bit-pattern sums (exact for -0.0/NaN, unlike a float masked
        sum). Bit-equal by construction; asserted by
        tests/test_accel.py::test_wide_ground_bit_equal and on TPU by
        scripts/tpu_invariants.py (wide_ground_on_off)."""
        S = FLAT_GROUND_STEPS
        g0 = c["mode"] == _M_GROUND
        # serial ladder: dist_i, and the per-step gd/res_d/res_m it implies
        dists = [c["dist"]]
        pys, gds, resds, resms = [], [], [], []
        for _ in range(S):
            dst = dists[-1]
            py = ray_pos.y + ray_dir.y * dst
            gd = py + opts.groundY
            take1 = gd < 1e5
            res_d = jnp.where(take1, gd, jnp.full_like(gd, 1e5))
            res_m = jnp.where(take1, gd, jnp.full_like(gd, -1.0))
            pys.append(py)
            gds.append(gd)
            resds.append(res_d)
            resms.append(res_m)
            dists.append(dst + res_d)
        lad = jnp.stack(dists, axis=-1)  # (..., S+1)
        dist_s = lad[..., :S]
        py_s = jnp.stack(pys, axis=-1)
        gd_s = jnp.stack(gds, axis=-1)
        resd_s = jnp.stack(resds, axis=-1)
        resm_s = jnp.stack(resms, axis=-1)

        pos_s = V3(
            ray_pos.x[..., None] + ray_dir.x[..., None] * dist_s,
            py_s,
            ray_pos.z[..., None] + ray_dir.z[..., None] * dist_s,
        )
        d_s = V3(ray_dir.x[..., None], ray_dir.y[..., None],
                 ray_dir.z[..., None])
        exit_s = intersects_box(bmin, bmax, pos_s, d_s) >= 0.0
        md = max_dist[..., None] if jnp.ndim(max_dist) else max_dist
        done_s = (jnp.abs(resd_s) <= opts.eps) | (dist_s >= md)
        iota = jnp.arange(S, dtype=_I32)
        fin_s = done_s | ((c["s"][..., None] + iota + 1) >= max_steps)

        go = ~exit_s & ~fin_s  # the serial loop keeps stepping this lane
        pend = g0[..., None] & _prefix_and_excl(go)  # step i is processed
        ev_exit = pend & exit_s
        act = pend & ~exit_s  # the serial a_i (incl. the fin step)
        n_act = jnp.sum(act, axis=-1, dtype=_I32)
        n_adv = jnp.sum(act & ~done_s, axis=-1, dtype=_I32)  # dist advances

        has_exit = jnp.any(ev_exit, axis=-1)
        has_fin = jnp.any(act & fin_s, axis=-1)
        mode = jnp.where(
            has_exit,
            _I32(_M_SETUP),
            jnp.where(has_fin, _I32(_M_DONE), c["mode"]),
        )
        # dist after n_adv ladder advances (one-hot over S+1 entries;
        # non-GROUND lanes have n_adv == 0 -> ladder[0] == c["dist"])
        iota1 = jnp.arange(S + 1, dtype=_I32)
        dist = _select_f32(iota1 == n_adv[..., None], lad)
        out = {**c, "mode": mode, "s": c["s"] + n_act, "dist": dist}
        if not lean:  # write-only outputs: last active step's values
            wrote = n_act > 0
            last = act & (iota == (n_act - 1)[..., None])
            out["dist_prev"] = jnp.where(
                wrote, _select_f32(last, dist_s), c["dist_prev"]
            )
            out["obj"] = jnp.where(
                wrote, _select_f32(last, resm_s).astype(_I32), c["obj"]
            )
            out["ovox"] = jnp.where(wrote, False, c["ovox"])
            out["hit"] = jnp.where(wrote, False, c["hit"])
            out["gd"] = jnp.where(wrote, _select_f32(last, gd_s), c["gd"])
        return out

    def cond(c):
        return jnp.any(c["mode"] != _M_DONE)

    def body(c):
        # fori_loop of a 2x-unrolled step (not full python unrolling) so the
        # ~200-op state-machine step is compiled only twice per raymarch
        # call site: a reflective preset instantiates raymarch a dozen times
        # and fully-unrolled steps blew the compile time up ~5x, while a
        # 1-step fori body paid ~10% runtime in loop overhead. Step
        # application is idempotent for DONE lanes, so trip count is pure
        # scheduling. (Wrapping blocks in lax.cond "any lane in this mode"
        # was measured DEAD — 6.80 -> 12.14 s: extra program regions inside
        # a TPU while body cost ~as much as executing them, PERFORMANCE.md.
        # The body must stay ONE straight-line masked block sequence.)
        def two(_, c):
            for _ in range(2):
                c = {**c, "apps": c["apps"] + (c["mode"] != _M_DONE).astype(_I32)}
                c = _setup(c)
                c = _march_and_book(c)
                c = _ground(c)
            return c

        c = jax.lax.fori_loop(0, FLAT_UNROLL // 2, two, c)
        return {**c, "round": c["round"] + 1}

    zi = jnp.zeros(shp, _I32)
    zf = jnp.zeros(shp, _F32)
    init_mode = (
        jnp.where(active, _I32(_M_SETUP), _I32(_M_DONE))
        if max_steps > 0
        else jnp.zeros(shp, _I32)
    )
    carry = {
        "mode": init_mode,
        "round": _I32(0),
        "apps": zi,  # per-lane state-machine applications consumed
        "s": zi,
        "dist": jnp.broadcast_to(opts.startDist, shp).astype(_F32),
        "k": zi,
        "cap": zi,
        "p0": V3(zf, zf, zf),
    }
    if not lean:
        carry.update({
            # position of the last processed sphere round = ray_pos + dir *
            # dist_prev (the nested path carries the position itself;
            # carrying the scalar and recomputing with the identical
            # expression is bit-equal and 3x smaller)
            "dist_prev": zf,
            "obj": zi,
            "ovox": jnp.zeros(shp, bool),  # last event's mat is voxel-won
            "hit": jnp.zeros(shp, bool),
            "q": V3(zi, zi, zi),
            "gd": zf,
        })
    c = jax.lax.while_loop(cond, body, _carry_vma(carry, ray_pos.x))
    if lean:
        # placeholders for the write-only outputs the lean carry dropped;
        # lean callers (shadow) consume only `distance` (+ apps)
        c["dist_prev"] = c["dist"]
        c["obj"] = zi
        c["ovox"] = jnp.zeros(shp, bool)
        c["hit"] = jnp.zeros(shp, bool)
        c["q"] = V3(zi, zi, zi)
        c["gd"] = zf
    c["pos"] = ray_pos + ray_dir * c["dist_prev"]
    if want_object:
        # deferred hit material: one element fetch per ray (see
        # _march_and_book). Skipped for shadow rays (want_object=False),
        # whose only consumer is the distance.
        hv, _ = voxel_fetch(vol, opts, c["q"])
        c["obj"] = jnp.where(
            c["ovox"], voxel_material(hv).astype(_I32), c["obj"]
        )
    return c
