"""Shading: sky, fog+flares, point lights with soft shadows, Blinn-Phong +
Schlick, Monte-Carlo AO, and multi-bounce reflections.

Capability parity with reference: resources/renderer.cl:259-446. Light and
bounce loops are statically unrolled (numLights <= 4, reflectIter <= 3 in all
presets) with per-ray active masks; every secondary raymarch passes its mask
down so the chunked march early-exits for lanes that don't need it. All
vector state is SoA (V3 of (N,) planes — see ops/vecmath.py).

Preserved reference quirks:
* albedo is multiplied into the accumulated diffuse term INSIDE the light
  loop, i.e. applied numLights times (renderer.cl:376);
* schlick() returns 0 (not r0) when the d term is exactly 0 (renderer.cl:310);
* the glossy-perturbed shading normal is not re-normalized (renderer.cl:420);
* all lights of a pixel share one jitter sample — the scatter seed does not
  depend on the light index (renderer.cl:267).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import sampling
from .march import _take_flat, distance_to_scene, raymarch
from .vecmath import V3, dot, mix, morton_quant_key, normalize, reflect, where3

_F32 = jnp.float32

# Band ROWS for the KEYED compacted secondary loops (shade_after_march_compact
# with prev_loops): per-loop history keys group like-cost lanes, so smaller
# bands capture the grouping where the unkeyed partition couldn't
# (audit_config4 --study-keys band sweep at 256^2 metal: paid secondary apps
# 30.4M @ 4096 rows -> 20.0M @ 1024 rows). The round-4 HW sweep at config 4
# (512^2 metal scatter, 4 spp) found the offline-apps optimum too deep once
# per-band fixed costs (program regions, pack permutes) are priced in:
# 512 rows 6.80 s / 1024 6.18 / 2048 5.87-5.89 / 4096 6.04. Under the
# round-5 per-lane POOLED stacked engine (render.STACK_REFLECTIVE) the
# optimum moved UP — pooled bands are fuller, so fewer, larger bands
# amortize fixed costs: config-4 spec 16-spp sweep on v5e (bit-equal)
# 2048 17.18 s / 4096 16.30 / **8192 16.28-16.29** / 16384 16.28 —
# shipped 8192 (plateau middle). Trace-time constant; hashes into the
# jit key via engine_key().
KEYED_TILE_ROWS = 8192


def sky_gradient(opts, rdir: V3) -> V3:
    """Vertical sky gradient (reference: renderer.cl:259-261)."""
    t = rdir.y * 0.5 + 0.5
    s1, s2 = opts.skyColor1, opts.skyColor2
    return V3(
        s1[0] + (s2[0] - s1[0]) * t,
        s1[1] + (s2[1] - s1[1]) * t,
        s1[2] + (s2[2] - s1[2]) * t,
    )


def light_pos_jittered(opts, table_t, px, py, i, block=None) -> V3:
    """Scattered light position (reference: renderer.cl:263-269).
    block: explicit per-lane table-block offsets for POOLED stacked lanes
    (sampling._table_idx)."""
    seed = sampling.light_seed(opts, px, py)
    j = sampling.rand_xyz(table_t, seed, block)
    lp = opts.lightPos
    return V3(
        lp[i, 0] + j.x * opts.lightScatter,
        lp[i, 1] + j.y * opts.lightScatter,
        lp[i, 2] + j.z * opts.lightScatter,
    )


def apply_atmosphere(opts, table_t, px, py, ray_pos: V3, ray_dir: V3,
                     isec_dist, col: V3, block=None) -> V3:
    """Exponential-squared fog toward the sky + per-light lens flares
    (reference: renderer.cl:275-290)."""
    fa = 1.0 - jnp.exp(isec_dist * isec_dist * -opts.fogPow)
    col = col + (sky_gradient(opts, ray_dir) - col) * fa
    for i in range(opts.numLights):
        lp = light_pos_jittered(opts, table_t, px, py, i, block)
        d = jnp.clip(dot(lp - ray_pos, ray_dir), 0.0, isec_dist)
        closest = (ray_pos - lp) + ray_dir * d
        amp = opts.flareAmp / dot(closest, closest)
        lc = opts.lightColor
        col = V3(
            col.x + lc[i, 0] * amp, col.y + lc[i, 1] * amp, col.z + lc[i, 2] * amp
        )
    return col


def shadow(vol, opts, p: V3, ldir: V3, light_max_dist, active, accel=None,
           want_stats=False):
    """Hard shadow: full re-raymarch toward the light, 0/1 result
    (reference: renderer.cl:292-301). Skips normal computation entirely.
    want_stats additionally returns per-ray march applications (cost input
    for the cost-sorted shade bands, ops/render.py)."""
    isec = raymarch(
        vol, opts, p, ldir, light_max_dist, opts.shadowIter,
        smooth=False, active=active, want_normal=False, accel=accel,
        truncate_to_max_dist=True, want_stats=want_stats, want_object=False,
    )
    sf = (isec["distance"] >= light_max_dist).astype(_F32)
    if want_stats:
        return sf, isec["apps"]
    return sf


def schlick(r0, smoothness, normal: V3, view: V3):
    """Schlick fresnel approximation (reference: renderer.cl:304-311)."""
    d = jnp.clip(1.0 - dot(normal, -view), 0.0, 1.0)
    d2 = d * d
    return jnp.where(d > 0.0, (1.0 - r0) * smoothness * d2 * d2 * d + r0, 0.0)


def diffuse_intensity(ldir: V3, normal: V3):
    """Lambert term (reference: renderer.cl:313-315)."""
    return jnp.maximum(0.0, dot(ldir, normal))


def blinn_phong_intensity(smoothness, ray_dir: V3, light_dir: V3, normal: V3):
    """Energy-normalized Blinn-Phong (reference: renderer.cl:317-325)."""
    nh = dot(normalize(light_dir - ray_dir), normal)
    spec_pow = jnp.exp2(6.0 * smoothness + 4.0)
    val = jnp.power(jnp.maximum(nh, 0.0), spec_pow) * (spec_pow + 2.0) * 0.125
    return jnp.where(nh > 0.0, val, 0.0)


def _ao_trunc_steps(opts, steps, i):
    """Exact AO march truncation bound for probe i (0-based).

    The AO factor is 1 - max((d_i - sd)*aoAmp/d_i, 0): any scene distance
    sd >= d_i contributes exactly 1, so the march may stop once a hit could
    only be farther than d_i. A hit at step k has distance
    k*steplen - voxelSize, with steplen = (2/steps)*min(invVoxelScale*
    voxelBounds2) per unit |dir| (AO directions are normalized). Bounding
    k <= (d_i + voxelSize)/steplen (+margin) is therefore output-preserving
    — sd beyond that is either the untouched ground term or irrelevant."""
    d_i = opts.aoStepDist * (i + 1)
    f = min(a * b for a, b in zip(opts.invVoxelScale, opts.voxelBounds2))
    steplen = (2.0 / steps) * f
    if steplen <= 0:
        return steps
    k = int((d_i + opts.voxelSize) / steplen) + 3
    return min(steps, k)


def ambient_occlusion(vol, opts, table_t, pos: V3, normal: V3, active,
                      accel=None, block=None):
    """Monte-Carlo AO: scene marches along scatter-jittered normals with a
    halved voxel budget (reference: renderer.cl:327-346). Statically
    unrolled aoIter+1 rounds with the reference's `ao > 0.01` early-out.

    Each probe march is truncated to the exact-output bound
    (_ao_trunc_steps): ~8-18 evaluated samples instead of 96, identical
    results."""
    ao = jnp.ones(pos.x.shape, _F32)
    seed0 = sampling.ao_seed(opts, pos)
    steps = opts.maxVoxelIter // 2
    for i in range(opts.aoIter + 1):
        act = active & (ao > 0.01)
        d = opts.aoStepDist * _F32(i + 1)
        seed = seed0 + jnp.uint32(37 * (i + 1))
        sn = normalize(sampling.rand_xyz(table_t, seed, block) * 0.2 + normal)
        sd = distance_to_scene(
            vol, opts, pos + sn * d, sn, steps, act, accel=accel,
            max_k=_ao_trunc_steps(opts, steps, i), want_material=False,
        )
        ao_new = ao * (1.0 - jnp.maximum((d - sd["dist"]) * opts.aoAmp / d, 0.0))
        ao = jnp.where(act, ao_new, ao)
    return ao


def _mat_gather(opts, mat_idx):
    """Material slot fields for per-ray indices (SoA component gathers;
    lane shape generic — multi-dim indices gather flattened)."""
    alb = V3(
        _take_flat(opts.mat_albedo[:, 0], mat_idx),
        _take_flat(opts.mat_albedo[:, 1], mat_idx),
        _take_flat(opts.mat_albedo[:, 2], mat_idx),
    )
    r0 = _take_flat(opts.mat_r0, mat_idx)
    smoothness = _take_flat(opts.mat_smoothness, mat_idx)
    return alb, r0, smoothness


def light_geometry(opts, table_t, px, py, isec_pos: V3, ray_dir: V3,
                   normal: V3, active, block=None):
    """Per-light shadow-ray geometry (reference: renderer.cl:263-269,
    359-366) — pure elementwise math, shared by the monolithic lighting
    path and the respill scheduler (ops/render.py), which recomputes it
    per phase instead of carrying ~7 arrays per light across phases
    (identical expressions => identical values)."""
    lt = []
    for i in range(opts.numLights):
        delta = light_pos_jittered(opts, table_t, px, py, i, block) - isec_pos
        d2 = dot(delta, delta)
        att = 1.0 / d2
        in_range = att > opts.minLightAtt
        ldir = normalize(delta)
        lmax = jnp.minimum(jnp.sqrt(d2) - opts.shadowBias, opts.maxDist)
        # Exact shadow-march skip: sf reaches the output only through
        # gain, which multiplies the Lambert and Blinn-Phong terms — both
        # provably zero when ndotl <= 0 AND nh <= 0 (the where() floors in
        # diffuse_intensity / blinn_phong_intensity), so such lanes render
        # identically with no march. (Same expressions as the combine loop;
        # NaN nh — ldir == ray_dir — yields 0 intensity on both sides.)
        relevant = (dot(ldir, normal) > 0.0) | (
            dot(normalize(ldir - ray_dir), normal) > 0.0
        )
        lt.append(dict(
            ldir=ldir, lmax=lmax, att=att, in_range=in_range,
            origin=isec_pos + ldir * opts.shadowBias,
            act=active & in_range & relevant,
        ))
    return lt


def light_combine(opts, ray_dir: V3, normal: V3, albedo, r0, smoothness,
                  reflect_col: V3, ao, lt, sfs) -> V3:
    """Post-shadow lighting combine (reference: renderer.cl:368-381) —
    pure elementwise; sfs are the per-light shadow factors."""
    diff = sky_gradient(opts, normal) * ao
    spec = reflect_col * ao
    final = V3.const((0.0, 0.0, 0.0), like=ao)
    fresnel = schlick(r0, smoothness, normal, ray_dir)

    for i, l in enumerate(lt):
        sf = sfs[i]
        lit = l["in_range"] & (sf > 0.0)
        gain = jnp.where(lit, sf * l["att"], 0.0)
        lc = opts.lightColor
        di = diffuse_intensity(l["ldir"], normal) * gain
        si = blinn_phong_intensity(smoothness, ray_dir, l["ldir"], normal) * gain
        diff = V3(
            diff.x + lc[i, 0] * di, diff.y + lc[i, 1] * di, diff.z + lc[i, 2] * di
        )
        spec = V3(
            spec.x + lc[i, 0] * si, spec.y + lc[i, 1] * si, spec.z + lc[i, 2] * si
        )
        diff = diff * albedo  # QUIRK: per-light albedo (renderer.cl:376)
        final = final + mix(diff, spec, fresnel)
    return final * (1.0 / _F32(opts.numLights))


def object_lighting(
    vol, opts, table_t, px, py, ray_dir: V3, isec_pos: V3, mat_idx, normal: V3,
    reflect_col: V3, active, accel=None, want_stats=False,
):
    """Direct lighting of a surface point (reference: renderer.cl:348-381).

    mat_idx: (N,) int32 clamped to [0, 3]. reflect_col: V3.
    want_stats: also return summed secondary-march applications (the cost
    signal for cost-sorted shade bands, ops/render.py).
    """
    albedo, r0, smoothness = _mat_gather(opts, mat_idx)
    apps = jnp.zeros_like(mat_idx)

    lt = light_geometry(opts, table_t, px, py, isec_pos, ray_dir, normal, active)

    # NOTE (measured negative result, v5e): merging all AO probes + shadow
    # sphere-traces into ONE per-lane state machine (so a band pays
    # max-over-lanes of TOTAL secondary work instead of summed per-phase
    # maxima) was built, verified bit-equal on TPU, and measured ~8% SLOWER
    # at every band size — per-phase costs CORRELATE across lanes (glancing
    # geometry is expensive in every phase), so max(sum) ~= sum(max) and
    # the machine's phase-select overhead wins. The same reasoning killed
    # STACK_LIGHT_SHADOWS (all lights' shadow marches concatenated along
    # the lane axis into one while_loop): bit-equal on v5e but pure noise
    # at BOTH the 1-light headline (3.553 vs 3.503 s) and the 2-light
    # config 4 (23.75 vs 23.71 s) — per-light round counts correlate, so
    # max-over-lights ~= per-light maxima, and lanes aren't free once the
    # loop is gather-bound. Deleted after the round-4 hardware A/B
    # (PERFORMANCE.md); git history has the implementation.
    ao = ambient_occlusion(vol, opts, table_t, isec_pos, normal, active, accel)
    sfs = []
    for l in lt:
        ret = shadow(
            vol, opts, l["origin"], l["ldir"], l["lmax"], l["act"],
            accel, want_stats=want_stats,
        )
        if not isinstance(ret, tuple):
            ret = (ret,)
        sfs.append(ret[0])
        if want_stats:
            apps = apps + ret[1]

    out = light_combine(
        opts, ray_dir, normal, albedo, r0, smoothness, reflect_col, ao, lt, sfs
    )
    if want_stats:
        return out, apps
    return out


def basic_scene_color(vol, opts, table_t, px, py, ray_pos: V3, ray_dir: V3,
                      active, accel=None, want_stats=False):
    """One-bounce scene color for reflection rays
    (reference: renderer.cl:383-405): fast-normal raymarch, lighting with a
    sky reflection, atmosphere. Returns (color V3, isec[, apps])."""
    isec = raymarch(
        vol, opts, ray_pos, ray_dir, opts.maxDist, opts.maxIter,
        smooth=False, active=active, want_normal=True, accel=accel,
        want_stats=want_stats,
    )
    sky = sky_gradient(opts, ray_dir)
    hit = isec["object_id"] >= 0
    mat_idx = jnp.clip(isec["object_id"], 0, 3)
    refl_sky = sky_gradient(opts, reflect(ray_dir, isec["normal"]))
    lit = object_lighting(
        vol, opts, table_t, px, py, ray_dir, isec["pos"], mat_idx,
        isec["normal"], refl_sky, active & hit, accel, want_stats=want_stats,
    )
    if want_stats:
        lit, l_apps = lit
    col = where3(hit, lit, sky)
    col = apply_atmosphere(
        opts, table_t, px, py, ray_pos, ray_dir, isec["distance"], col
    )
    if want_stats:
        return col, isec, isec["apps"] + l_apps
    return col, isec


def scene_color(vol, opts, table_t, state, ray_pos: V3, ray_dir: V3, accel=None) -> V3:
    """Primary shading: smooth-normal raymarch, glossy-perturbed normal,
    optional multi-bounce reflections, lighting, atmosphere
    (reference: renderer.cl:407-446)."""
    n_rays = ray_pos.x.shape[0]
    active = jnp.ones((n_rays,), bool)
    isec = raymarch(
        vol, opts, ray_pos, ray_dir, opts.maxDist, opts.maxIter,
        smooth=True, active=active, want_normal=True, accel=accel,
    )
    return shade_after_march(
        vol, opts, table_t, state["px"], state["py"], state["mc_normal"],
        ray_pos, ray_dir, isec, accel,
    )


def shade_after_march(
    vol, opts, table_t, px, py, mc_normal: V3, ray_pos: V3, ray_dir: V3,
    isec, accel=None, want_stats=False, active=None,
):
    """Everything in sceneColor after the primary raymarch
    (renderer.cl:414-445): glossy normal, bounce loop / sky reflection,
    lighting, atmosphere. Split out so deferred shading (ops/render.py) can
    run it over hit-sorted ray order.

    want_stats: also return the summed march applications of every
    secondary raymarch (shadows + bounces) — the cost signal the deferred
    pipeline feeds back into the next pass's band sort.

    `active` restricts the secondary marches to a lane subset — inactive
    lanes' colors are garbage. Return order: (col[, apps])."""
    apps = jnp.zeros(ray_dir.x.shape, jnp.int32)
    sky = sky_gradient(opts, ray_dir)
    hit = isec["distance"] < opts.maxDist  # renderer.cl:415
    shade_act = hit if active is None else (hit & active)
    mat_idx = jnp.clip(isec["object_id"], 0, 3)
    _, r0, smoothness = _mat_gather(opts, mat_idx)
    # glossy perturbation, NOT re-normalized (renderer.cl:420)
    norm_p = isec["normal"] + mc_normal * (1.0 / (smoothness * 200.0 + 5.0))

    if opts.reflectIter > 0:
        b_active = shade_act & (r0 > 0.0)
        acc = V3.const((0.0, 0.0, 0.0), like=r0)
        r_dir = ray_dir
        r_pos = isec["pos"]
        r_norm = norm_p
        for _ in range(opts.reflectIter):
            r_dir = where3(b_active, reflect(r_dir, r_norm), r_dir)
            bounce_origin = r_pos + r_dir * 0.0075  # renderer.cl:434
            bounce = basic_scene_color(
                vol, opts, table_t, px, py, bounce_origin, r_dir, b_active,
                accel, want_stats=want_stats,
            )
            if want_stats:
                col_i, bisec, b_apps = bounce
                apps = apps + b_apps
            else:
                col_i, bisec = bounce
            acc = where3(b_active, acc + col_i, acc)
            b_hit = bisec["object_id"] >= 0
            b_r0 = _take_flat(opts.mat_r0, jnp.clip(bisec["object_id"], 0, 3))
            b_active = b_active & b_hit & (b_r0 >= 0.001)  # renderer.cl:436-437
            r_pos = bisec["pos"]
            r_norm = bisec["normal"]
        reflect_col = where3(
            r0 > 0.0, acc, sky_gradient(opts, reflect(ray_dir, norm_p))
        )
    else:
        reflect_col = sky_gradient(opts, reflect(ray_dir, norm_p))

    ret = object_lighting(
        vol, opts, table_t, px, py, ray_dir, isec["pos"], mat_idx,
        norm_p, reflect_col, shade_act, accel, want_stats=want_stats,
    )
    if isinstance(ret, V3):  # V3 is a NamedTuple — don't unpack it
        ret = (ret,)
    lit = ret[0]
    if want_stats:
        apps = apps + ret[1]
    col = where3(hit, lit, sky)
    col = apply_atmosphere(
        opts, table_t, px, py, ray_pos, ray_dir, isec["distance"], col
    )
    if want_stats:
        return col, apps
    return col


# --- active-lane-compacted secondary loops (reflective presets) ------------
#
# The config-4 audit (scripts/audit_config4.py, 256^2 metal scatter, v5e)
# measured the 12 secondary while_loops of a reflective pass paying 11.9x
# their useful applications: bounce marches and bounce-hit shadow marches
# have small active sets (3-17% of lanes) SMEARED across every cost band,
# and a band charges its worst lane's rounds whether one lane is active or
# all are. Stable-partitioning each loop's lanes so actives come first
# (original cost-sorted order preserved within classes) packs the work into
# the leading bands; all-inactive bands exit their while_loop on the first
# condition check. Offline band reconstruction predicts paid secondary
# applications 70.4M -> 38.1M per pass (1.85x) for config 4.
#
# Pure lane regrouping: per-lane march math is lane-independent (the
# existing band-tiling invariant proves outputs don't depend on band
# composition), so outputs are bit-equal on TPU; CPU tolerance-only like
# every grouping invariant (FMA contraction). The permutation is two
# cumsums + one scatter + gathers — no sort.


def _compact_perm(act):
    """Stable-partition rank for a boolean active mask: lane i's value lands
    at compact slot rank[i]; active lanes occupy slots [0, n_active) in
    original order. Two cumsums — no sort."""
    a = act.astype(jnp.int32)
    ca = jnp.cumsum(a)
    return jnp.where(act, ca - 1, ca[-1] + jnp.cumsum(1 - a) - 1)


def _pack_u32(tree):
    """Bitcast a pytree of (N,) arrays (f32/i32/u32/bool) into one (N, K)
    u32 matrix. Arbitrary-index data movement on this platform is priced
    PER ROW, not per element (a <=256 B row gather costs ~1.6x ONE element
    — PERFORMANCE.md round-2), so permuting one packed matrix beats K
    separate element gathers ~K/1.6-fold. Bitcasts are exact (NaN payloads
    included); bool rides as 0/1."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    cols = []
    for l in leaves:
        if l.dtype == jnp.bool_:
            cols.append(l.astype(jnp.uint32))
        elif l.dtype == jnp.uint32:
            cols.append(l)
        else:
            cols.append(jax.lax.bitcast_convert_type(l, jnp.uint32))
    return jnp.stack(cols, axis=-1), leaves, treedef


def _unpack_u32(mat, leaves, treedef):
    outs = []
    for i, l in enumerate(leaves):
        c = mat[:, i]
        if l.dtype == jnp.bool_:
            c = c.astype(jnp.bool_)
        elif l.dtype != jnp.uint32:
            c = jax.lax.bitcast_convert_type(c, l.dtype)
        outs.append(c)
    return jax.tree_util.tree_unflatten(treedef, outs)


def _compact_banded(tiles, act, fn, ins, key=None):
    """Run `fn` (dict of (nt,...) band arrays -> dict of band outputs,
    containing a banded while-loop march) over `tiles` bands with the
    active lanes compacted to the front. Returns full-frame outputs in the
    caller's lane order. Data movement is ONE packed row scatter in + ONE
    packed row gather out (see _pack_u32).

    key: optional (N,) int32 WITHIN-ACTIVE ordering key (< 2**30) — active
    lanes are additionally sorted ascending by it (stable), so lanes with
    similar expected cost share a band and the band-max charge drops. The
    config-4 audit (scripts/audit_config4.py --study-keys) measures
    per-loop history+Morton keys cutting paid secondary applications a
    further ~1.3x over plain partition; the keyed rank costs the same as
    the 2-cumsum partition on v5e (the packed scatter/gather dominates
    either way). Ordering is grouping-only — outputs stay bit-equal."""
    if key is not None:
        sp = jnp.argsort(
            jnp.where(act, key, jnp.int32(2**30)), stable=True)
        rank = (
            jnp.zeros_like(sp)
            .at[sp]
            .set(jnp.arange(sp.shape[0], dtype=jnp.int32))
        )
    else:
        rank = _compact_perm(act)
    mat, leaves, treedef = _pack_u32(ins)
    mat_c = jnp.zeros_like(mat).at[rank].set(mat)
    ins_c = _unpack_u32(mat_c, leaves, treedef)
    n = act.shape[0]
    nt = n // tiles
    xs = jax.tree_util.tree_map(
        lambda x: x.reshape((tiles, nt) + x.shape[1:]), ins_c)
    _, out = jax.lax.scan(lambda c, x: (None, fn(x)), None, xs)
    out = jax.tree_util.tree_map(
        lambda x: x.reshape((n,) + x.shape[2:]), out)
    mat_o, leaves_o, treedef_o = _pack_u32(out)
    return _unpack_u32(jnp.take(mat_o, rank, axis=0), leaves_o, treedef_o)


def compact_loop_names(opts):
    """Static names of the keyed compacted secondary loops for a reflective
    preset: bounce marches `b{b}m`, bounce shadows `b{b}s{li}`, primary
    shadows `ps{li}`. These are the loops whose per-lane applications the
    deferred pipeline carries across passes as per-loop history keys (AO
    probes are excluded: ~free at spec after exact truncation)."""
    names = []
    for b in range(opts.reflectIter):
        names.append(f"b{b}m")
        names += [f"b{b}s{li}" for li in range(opts.numLights)]
    names += [f"ps{li}" for li in range(opts.numLights)]
    return names


def shade_after_march_compact(
    vol, opts, table_t, tiles, px, py, mc_normal: V3, ray_pos: V3,
    ray_dir: V3, isec, accel=None, want_stats=False, prev_loops=None,
    tblock=None,
):
    """shade_after_march with every secondary while_loop (bounce marches,
    shadow marches, AO probes) run over active-compacted cost bands.

    Per-lane math follows shade_after_march / basic_scene_color /
    object_lighting expression-for-expression (renderer.cl:348-445); only
    the lane grouping of the secondary loops differs, so results are
    bit-equal on TPU. Elementwise glue (light geometry, combine,
    atmosphere) runs full-frame — banding only ever existed for the
    while_loops.

    prev_loops: optional dict (see compact_loop_names) of (N,) int32
    PER-LOOP history keys in the caller's lane order (the previous pass's
    5x5-max-filtered applications of the same loop) — each loop's active
    lanes are then ordered by its own key inside the compaction
    (_compact_banded(key=...)), and the return value grows a per-loop apps
    dict: (col, apps, loop_apps). Measured offline (audit_config4
    --study-keys): paid secondary apps 38.6M -> 30.4M at 4096-row bands,
    -> 20.0M at 1024-row bands. Ordering is grouping-only: bit-equal.

    tblock: optional (N,) int32 per-lane table-block offsets when the
    caller's lanes are POOLED stacked passes flattened to 1-D (per-lane
    compacted stacked secondaries, render.py): every table consumer
    (light jitter, AO scatter, flares) gathers from the lane's own pass
    block of the (4, P*T) stacked table, and opts.time must already be
    the matching per-lane row. None = single-pass lanes (unchanged)."""
    n = ray_dir.x.shape[0]
    apps = [jnp.zeros((n,), jnp.int32)]
    loop_apps = {}
    key_of = (lambda name: None) if prev_loops is None else prev_loops.get
    tiles_k = tiles
    if prev_loops is not None:
        assert want_stats, "prev_loops requires want_stats (per-loop apps)"
        while n % (tiles_k * 2) == 0 and n // (tiles_k * 2) >= KEYED_TILE_ROWS:
            tiles_k *= 2

    def _loop_key(name, origin):
        # composite within-active ordering key: previous-pass cost bucket
        # (12 bits, the audit's best signal) | loop-origin Morton tiebreak
        # (14 bits) — fits under _compact_banded's 2**30 inactive sentinel
        hist = key_of(name)
        if hist is None:
            return None
        return (jnp.clip(hist, 0, 4095) << 14) | (morton_quant_key(origin) >> 16)

    sky = sky_gradient(opts, ray_dir)
    hit = isec["distance"] < opts.maxDist  # renderer.cl:415
    shade_act = hit
    mat_idx = jnp.clip(isec["object_id"], 0, 3)
    _, r0, smoothness = _mat_gather(opts, mat_idx)
    norm_p = isec["normal"] + mc_normal * (1.0 / (smoothness * 200.0 + 5.0))

    def march_fn(xs):
        ret = raymarch(
            vol, opts, xs["pos"], xs["dir"], opts.maxDist, opts.maxIter,
            smooth=False, active=xs["act"], want_normal=True, accel=accel,
            want_stats=want_stats,
        )
        out = {"pos": ret["pos"], "normal": ret["normal"],
               "distance": ret["distance"], "object_id": ret["object_id"]}
        if want_stats:
            out["apps"] = ret["apps"]
        return out

    def shadow_fn(xs):
        ret = shadow(vol, opts, xs["origin"], xs["ldir"], xs["lmax"],
                     xs["act"], accel, want_stats=want_stats)
        if want_stats:
            return {"sf": ret[0], "apps": ret[1]}
        return {"sf": ret}

    def ao_fn(xs):
        return {"ao": ambient_occlusion(
            vol, opts_of(xs), table_t, xs["pos"], xs["normal"], xs["act"],
            accel, block=xs.get("tb"))}

    def opts_of(xs):
        # per-lane opts.time must ride the banding with the lanes (AO
        # seeds hash it); identity for single-pass lanes (scalar time)
        return opts if "time" not in xs else opts.replace(time=xs["time"])

    def ao_ins(pos, normal, act):
        ins = {"pos": pos, "normal": normal, "act": act}
        if tblock is not None:
            ins["tb"] = tblock
            if getattr(opts.time, "ndim", 0) >= 1:
                ins["time"] = opts.time
        return ins

    def lighting(pos, view_dir, midx, normal, refl_col, act, sname=None):
        # object_lighting (renderer.cl:348-381), loops compact-banded;
        # sname: light index -> loop name for the per-loop history keys
        albedo_l, r0_l, sm_l = _mat_gather(opts, midx)
        lt = light_geometry(opts, table_t, px, py, pos, view_dir, normal,
                            act, block=tblock)
        ao = _compact_banded(
            tiles, act, ao_fn, ao_ins(pos, normal, act)
        )["ao"]
        sfs = []
        for li, l in enumerate(lt):
            name = None if sname is None else sname(li)
            k = None if name is None else _loop_key(name, l["origin"])
            ret = _compact_banded(
                tiles if k is None else tiles_k, l["act"], shadow_fn,
                {"origin": l["origin"], "ldir": l["ldir"], "lmax": l["lmax"],
                 "act": l["act"]},
                key=k,
            )
            sfs.append(ret["sf"])
            if want_stats:
                apps[0] = apps[0] + ret["apps"]
                if name is not None and prev_loops is not None:
                    loop_apps[name] = ret["apps"]
        return light_combine(
            opts, view_dir, normal, albedo_l, r0_l, sm_l, refl_col, ao, lt, sfs
        )

    if opts.reflectIter > 0:
        b_active = shade_act & (r0 > 0.0)
        acc = V3.const((0.0, 0.0, 0.0), like=r0)
        r_dir, r_pos, r_norm = ray_dir, isec["pos"], norm_p
        for b in range(opts.reflectIter):
            r_dir = where3(b_active, reflect(r_dir, r_norm), r_dir)
            bounce_origin = r_pos + r_dir * 0.0075  # renderer.cl:434
            k = _loop_key(f"b{b}m", bounce_origin)
            bisec = _compact_banded(
                tiles if k is None else tiles_k, b_active, march_fn,
                {"pos": bounce_origin, "dir": r_dir, "act": b_active},
                key=k,
            )
            if want_stats:
                apps[0] = apps[0] + bisec["apps"]
                if prev_loops is not None:
                    loop_apps[f"b{b}m"] = bisec["apps"]
            # basic_scene_color (renderer.cl:383-405), loops compact-banded
            b_sky = sky_gradient(opts, r_dir)
            b_hit = bisec["object_id"] >= 0
            b_mat = jnp.clip(bisec["object_id"], 0, 3)
            refl_sky = sky_gradient(opts, reflect(r_dir, bisec["normal"]))
            lit_b = lighting(
                bisec["pos"], r_dir, b_mat, bisec["normal"], refl_sky,
                b_active & b_hit, sname=lambda li, b=b: f"b{b}s{li}",
            )
            col_i = where3(b_hit, lit_b, b_sky)
            col_i = apply_atmosphere(
                opts, table_t, px, py, bounce_origin, r_dir,
                bisec["distance"], col_i, block=tblock,
            )
            acc = where3(b_active, acc + col_i, acc)
            b_r0 = jnp.take(opts.mat_r0, b_mat)
            b_active = b_active & b_hit & (b_r0 >= 0.001)  # renderer.cl:436-437
            r_pos, r_norm = bisec["pos"], bisec["normal"]
        reflect_col = where3(
            r0 > 0.0, acc, sky_gradient(opts, reflect(ray_dir, norm_p))
        )
    else:
        reflect_col = sky_gradient(opts, reflect(ray_dir, norm_p))

    lit = lighting(isec["pos"], ray_dir, mat_idx, norm_p, reflect_col,
                   shade_act, sname=lambda li: f"ps{li}")
    col = where3(hit, lit, sky)
    col = apply_atmosphere(
        opts, table_t, px, py, ray_pos, ray_dir, isec["distance"], col,
        block=tblock,
    )
    if want_stats:
        if prev_loops is not None:
            return col, apps[0], loop_apps
        return col, apps[0]
    return col
