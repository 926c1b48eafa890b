"""Offline study: per-LANE compaction of PASS-STACKED reflective secondaries.

Round 4 extended the (N, P) stacked engine through config 4's compacted
secondary loops at pixel-ROW granularity and measured a large regression
(P=8 31.6 s vs P=1 23.75 s at 4 spp): a row stays in a loop while ANY of
its P lanes is active, so stacking multiplied paid applications faster
than it amortized fixed costs. VERDICT r4 (weak #7) named the untried
variant: compact stacked secondaries at LANE granularity — each of the
P*N lanes packs by its OWN active flag, so the union dilution disappears
and actives from P passes POOL into fuller bands.

This script collects per-loop (apps, active, origin-morton) maps for all
spp passes of the config-4 workload (scatter volume, metal preset;
schedule-independent — loops run full-frame unbanded, renderer.cl:426-438
bounce chain + :292-301 shadows), then replays three schedules offline at
KEYED_TILE_ROWS-lane bands:

  A. production unstacked: per pass, per loop, actives sorted by the
     5x5-max-filtered per-loop decaying-max history | origin-morton
     (shade._loop_key), inactives tail — what ships today.
  B. pooled per-lane stacked P: the group's P passes' lanes pooled
     (P*N), compacted per lane by own-active, ordered by the per-PIXEL
     history broadcast | per-lane origin-morton.
  C. row-stacked (the round-4 regression, for reference): all P lanes of
     a pixel ride together; a row is active if any lane is.

Paid apps model the while_loop band charge (band-max x band lanes). The
per-app RATE difference between 1-D and (rows, P) trailing bands is NOT
modeled here — hardware A/B decides that; this study only rules the
schedule in/out on paid applications.

Usage: python scripts/study_lane_stack_cfg4.py [--size 512] [--spp 16]
       [--p 8] [--save-maps F.npz | --load-maps F.npz]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def maxfilt_np(m, w, k):
    n = m.shape[0]
    if w <= 0 or n % w != 0 or n // w < 2:
        return m
    a = m.reshape(n // w, w)
    r = k // 2
    pad = np.pad(a, ((r, r), (r, r)), mode="edge")
    out = a.copy()
    for dy in range(k):
        for dx in range(k):
            np.maximum(out, pad[dy:dy + a.shape[0], dx:dx + a.shape[1]],
                       out=out)
    return out.reshape(-1)


def band_paid_lanes(apps_sorted, band_lanes):
    a = np.asarray(apps_sorted, np.int64)
    nb = a.shape[0] // band_lanes
    paid = int(a[: nb * band_lanes].reshape(nb, band_lanes).max(axis=1).sum()
               * band_lanes)
    rem = a.shape[0] - nb * band_lanes
    if rem:
        paid += int(a[nb * band_lanes:].max(initial=0) * rem)
    return paid


def collect(args):
    import jax
    import jax.numpy as jnp

    from raymarchcl_tpu.api import build_accel_for
    from raymarchcl_tpu.models import mesh
    from raymarchcl_tpu.ops import shade
    from raymarchcl_tpu.ops.camera import camera_ray_lookat, compute_eyepos
    from raymarchcl_tpu.ops.march import raymarch
    from raymarchcl_tpu.ops.render import TIME_STEP_INIT, _morton10
    from raymarchcl_tpu.ops.sampling import (
        init_render_state, make_mc_tables, transpose_table)
    from raymarchcl_tpu.ops.vecmath import reflect, where3
    from raymarchcl_tpu.options import render_options

    import os

    stl = os.path.join(os.path.dirname(__file__), "..", "assets",
                       "trefoil.stl")
    volume_np = mesh.voxelize_scatter(mesh.read_stl(stl), args.vres, seed=3)
    vol = jnp.asarray(volume_np, jnp.uint8)
    opts = render_options(
        width=args.size, height=args.size, vres=[args.vres] * 3,
        iter=args.spp, mat="metal",
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    accel = build_accel_for(volume_np, opts)
    tables = make_mc_tables(args.spp, seed=0)
    n = opts.num_pixels
    ids = jnp.arange(n, dtype=jnp.int32)

    qscale = jnp.float32(1023.0 / 4.0)

    def qk(c):
        return jnp.clip((c + 2.0) * qscale, 0.0, 1023.0).astype(jnp.int32)

    @jax.jit
    def stage_all(vol, opts, table_t, ids_t, accel):
        # per-loop (apps, act, origin-morton), natural pixel order; mirrors
        # shade.shade_after_march_compact's loop structure exactly
        out = {}
        state = init_render_state(opts, table_t, ids_t)
        ray_pos, ray_dir = camera_ray_lookat(opts, state)
        act = jnp.ones((ids_t.shape[0],), bool)
        isec = raymarch(
            vol, opts, ray_pos, ray_dir, opts.maxDist, opts.maxIter,
            smooth=True, active=act, want_normal=True, accel=accel,
            want_stats=True,
        )
        px, py, mcn = state["px"], state["py"], state["mc_normal"]
        hit = isec["distance"] < opts.maxDist
        mat_idx = jnp.clip(isec["object_id"], 0, 3)
        _, r0, smoothness = shade._mat_gather(opts, mat_idx)
        norm_p = isec["normal"] + mcn * (1.0 / (smoothness * 200.0 + 5.0))

        def morton_of(v3):
            return _morton10(qk(v3.x), qk(v3.y), qk(v3.z))

        b_active = hit & (r0 > 0.0)
        r_dir, r_pos, r_norm = ray_dir, isec["pos"], norm_p
        for b in range(opts.reflectIter):
            r_dir = where3(b_active, reflect(r_dir, r_norm), r_dir)
            borig = r_pos + r_dir * 0.0075
            bisec = raymarch(
                vol, opts, borig, r_dir, opts.maxDist, opts.maxIter,
                smooth=False, active=b_active, want_normal=True,
                accel=accel, want_stats=True,
            )
            out[f"b{b}m"] = (bisec["apps"], b_active, morton_of(borig))
            bh = bisec["object_id"] >= 0
            bmat = jnp.clip(bisec["object_id"], 0, 3)
            blt = shade.light_geometry(
                opts, table_t, px, py, bisec["pos"], r_dir, bisec["normal"],
                b_active & bh,
            )
            for li, l in enumerate(blt):
                _, sapps = shade.shadow(
                    vol, opts, l["origin"], l["ldir"], l["lmax"], l["act"],
                    accel, want_stats=True,
                )
                out[f"b{b}s{li}"] = (sapps, l["act"], morton_of(l["origin"]))
            b_r0 = jnp.take(opts.mat_r0, bmat)
            b_active = b_active & bh & (b_r0 >= 0.001)
            r_pos, r_norm = bisec["pos"], bisec["normal"]

        lt = shade.light_geometry(
            opts, table_t, px, py, isec["pos"], ray_dir, norm_p, hit)
        for li, l in enumerate(lt):
            _, sapps = shade.shadow(
                vol, opts, l["origin"], l["ldir"], l["lmax"], l["act"],
                accel, want_stats=True,
            )
            out[f"ps{li}"] = (sapps, l["act"], morton_of(l["origin"]))
        return out

    passes = []
    for p in range(args.spp):
        op = opts.replace(time=jnp.float32(p * TIME_STEP_INIT))
        res = jax.device_get(
            stage_all(vol, op, transpose_table(tables[p]), ids, accel))
        passes.append({k: (v[0].astype(np.int32), v[1], v[2].astype(np.int32))
                       for k, v in res.items()})
        print(f"  pass {p + 1}/{args.spp} collected", file=sys.stderr,
              flush=True)
    return passes, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--vres", type=int, default=128)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--p", type=int, default=8)
    ap.add_argument("--band", type=int, default=2048,
                    help="band lanes (KEYED_TILE_ROWS)")
    ap.add_argument("--save-maps", default=None)
    ap.add_argument("--load-maps", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.load_maps:
        z = np.load(args.load_maps)
        names = sorted({k.rsplit("_", 1)[0] for k in z.files
                        if k.endswith("_apps")})
        spp = z[names[0] + "_apps"].shape[0]
        passes = [
            {nm: (z[nm + "_apps"][p], z[nm + "_act"][p], z[nm + "_mk"][p])
             for nm in names} for p in range(spp)
        ]
        n = passes[0][names[0]][0].shape[0]
        args.spp = spp
    else:
        passes, n = collect(args)
        if args.save_maps:
            flat = {}
            names = list(passes[0])
            for nm in names:
                flat[nm + "_apps"] = np.stack([pp[nm][0] for pp in passes])
                flat[nm + "_act"] = np.stack([pp[nm][1] for pp in passes])
                flat[nm + "_mk"] = np.stack([pp[nm][2] for pp in passes])
            np.savez_compressed(args.save_maps, **flat)

    w = args.size
    names = list(passes[0])
    R = args.band
    P = args.p
    useful = {nm: sum(int(pp[nm][0].astype(np.int64).sum()) for pp in passes)
              for nm in names}

    def key_sorted(apps, act, mk, hist):
        key = np.where(
            act,
            (np.clip(hist, 0, 4095).astype(np.int64) << 14)
            | (mk.astype(np.int64) >> 16),
            (np.int64(1) << 40) + np.arange(apps.shape[0], dtype=np.int64),
        )
        return apps[np.argsort(key, kind="stable")]

    # A: production unstacked with per-loop decaying-max history
    paid_a = {nm: 0 for nm in names}
    hist = {nm: np.zeros(n, np.int64) for nm in names}
    for pp in passes:
        for nm in names:
            apps, act, mk = pp[nm]
            hk = maxfilt_np(hist[nm], w, 5)
            paid_a[nm] += band_paid_lanes(
                key_sorted(apps.astype(np.int64), act, mk, hk), R)
            hist[nm] = np.maximum(apps.astype(np.int64),
                                  hist[nm] - (hist[nm] >> 2))

    # B: pooled per-lane stacked; C: row-stacked (round-4 regression)
    paid_b = {nm: 0 for nm in names}
    paid_c = {nm: 0 for nm in names}
    histg = {nm: np.zeros(n, np.int64) for nm in names}
    n_groups = args.spp // P
    for g in range(n_groups):
        grp = passes[g * P: (g + 1) * P]
        for nm in names:
            apps = np.stack([pp[nm][0] for pp in grp]).astype(np.int64)
            act = np.stack([pp[nm][1] for pp in grp])
            mk = np.stack([pp[nm][2] for pp in grp])
            hk = maxfilt_np(histg[nm], w, 5)
            # B: per-lane pool (P*n lanes), per-pixel history broadcast
            paid_b[nm] += band_paid_lanes(
                key_sorted(apps.reshape(-1), act.reshape(-1),
                           mk.reshape(-1),
                           np.broadcast_to(hk, (P, n)).reshape(-1)), R)
            # C: row granularity — any-lane active, row rides together,
            # R//P rows per band so band lanes == R
            row_act = act.any(axis=0)
            key = np.where(
                row_act,
                (np.clip(hk, 0, 4095) << 14)
                | (mk[0].astype(np.int64) >> 16),
                (np.int64(1) << 40) + np.arange(n, dtype=np.int64),
            )
            order = np.argsort(key, kind="stable")
            paid_c[nm] += band_paid_lanes(apps[:, order].T.reshape(-1), R)
            histg[nm] = np.maximum(apps.max(axis=0),
                                   histg[nm] - (histg[nm] >> 2))

    tot = {"useful": sum(useful.values()),
           "A_unstacked": sum(paid_a.values()),
           "B_lane_stacked": sum(paid_b.values()),
           "C_row_stacked": sum(paid_c.values())}
    print(json.dumps({
        "config": f"{args.size}^2/metal/scatter/{args.spp}spp P={P} R={R}",
        "per_loop": {nm: {"useful": useful[nm], "A": paid_a[nm],
                          "B": paid_b[nm], "C": paid_c[nm]}
                     for nm in names},
        "total": tot,
        "ov": {k: round(v / max(tot["useful"], 1), 3)
               for k, v in tot.items() if k != "useful"},
    }, indent=1))


if __name__ == "__main__":
    main()
