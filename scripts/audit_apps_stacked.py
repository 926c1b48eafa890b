"""Paid-vs-useful application audit under the STACKED round-4 engine.

The round-3 audit (scripts/audit_apps.py) established "~84% of the
row-gather floor" for the UNSTACKED engine; pass-stacking then changed both
sides of the ratio — paid lane-apps grow (a band maxes over nt*P lanes
instead of nt) while the per-app op share is amortized by P. This script
re-derives the floor accounting at spec for the ACTUAL round-4 schedule
(VERDICT r4 item 1: "the single most important unknown in the project").

Method: per-lane app counts are schedule-independent (the engine is
bit-equal across band orders — tests/test_accel.py), so we
1. collect per-pass per-pixel march/shade app maps (16 instrumented
   unstacked passes, zero prev-cost: apps don't depend on the sort),
   plus pass-0/8 primary hit positions + distances (the stacked group
   keys' Morton tiebreak / any-hit split need them);
2. reconstruct OFFLINE the production stacked schedule (2 groups of P=8,
   bands of STACK_TILE_ROWS rows x P trailing lanes, group-entry sort by
   the previous group's decaying-max cost, phase-B key = clipped cost<<14 |
   morton>>16 with any-pass-hit rows first) and the production unstacked
   schedule (16 passes, per-pass decaying-max keys) — both as
   render.py:459+ executes them;
3. price paid apps against measured stage times (pass fresh --t-march-ms /
   --t-shade-ms from scripts/profile_stages.py at spec) and against the
   recorded ~18 ns/paid-app in-program row-gather floor.

Reference workload being floored: renderer.cl:478-494 at core.clj:28-74
defaults (gyroid 512^2 / 16 spp / ao).

Usage: python scripts/audit_apps_stacked.py [--size 512] [--t-march-ms X]
       [--t-shade-ms Y] [--cpu]
Writes one JSON line to stdout.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def band_paid(apps_band_order, bands):
    """apps_band_order: (n_lanes,) int64 in band order; paid = sum over
    bands of band-max x band size."""
    a = np.asarray(apps_band_order, np.int64)
    nl = a.shape[0] // bands
    return int(a.reshape(bands, nl).max(axis=1).sum() * nl)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--t-march-ms", type=float, default=None,
                    help="measured march stage ms for the FULL frame "
                         "(profile_stages: no-lights minus fixed)")
    ap.add_argument("--t-shade-ms", type=float, default=None,
                    help="measured shade stage ms for the FULL frame "
                         "(profile_stages: full minus no-lights)")
    ap.add_argument("--frame-ms", type=float, default=None,
                    help="measured full frame ms (bench.py headline)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save-maps", default=None,
                    help="npz path: save collected per-pass maps")
    ap.add_argument("--load-maps", default=None,
                    help="npz path: skip collection, analyze cached maps")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import camera_ray_lookat, compute_eyepos
    from raymarchcl_tpu.ops.march import raymarch
    from raymarchcl_tpu.ops.render import (
        MAX_TILES, STACK_TILE_ROWS, _maxfilt2d, _morton10, auto_tiles,
    )
    from raymarchcl_tpu.ops.sampling import (
        init_render_state, make_mc_tables, transpose_table,
    )
    from raymarchcl_tpu.options import render_options

    spp = args.spp
    # production p_eff: largest divisor of the pass count <= PASS_STACK
    # (render.py render_accum)
    p_stack = 1
    for cand in range(min(render_mod.PASS_STACK, spp), 0, -1):
        if spp % cand == 0:
            p_stack = cand
            break
    volume_np, vres = default_volume((args.vres,) * 3)
    vol = jnp.asarray(volume_np, jnp.uint8)
    opts = render_options(
        width=args.size, height=args.size, vres=list(vres), iter=spp,
        mat=args.mat, eyepos=compute_eyepos(135.0, 2.25, 0.35),
        targetpos=[0, -0.4, 0],
    )
    accel = build_accel_for(volume_np, opts)
    tables = make_mc_tables(spp, seed=0)
    n = opts.num_pixels
    w = args.size

    # unstacked production tiling (render_accum/auto_tiles)
    tiles_u = auto_tiles(n)
    while tiles_u > 1 and (n % tiles_u != 0 or n // tiles_u < 512):
        tiles_u //= 2
    # stacked production tiling (render_accum PASS_STACK branch)
    tiles_s = 1
    while (tiles_s < MAX_TILES and n % (tiles_s * 2) == 0
           and n // (tiles_s * 2) >= STACK_TILE_ROWS):
        tiles_s *= 2

    ids = jnp.arange(n, dtype=jnp.int32)
    accum0 = jnp.zeros((n, 3), jnp.float32)
    zero_cost = {"a": jnp.zeros((n,), jnp.int32),
                 "b": jnp.zeros((n,), jnp.int32)}

    @jax.jit
    def pass_maps(vol, opts, table_t, accel, accum0, ids, zero):
        _, maps = render_mod._render_pass_deferred(
            vol, opts, table_t, accum0, ids, accel, tiles_u, prev_cost=zero)
        return maps

    @jax.jit
    def pass_primary(vol, opts, table_t, accel, ids):
        state = init_render_state(opts, table_t, ids)
        ray_pos, ray_dir = camera_ray_lookat(opts, state)
        act = jnp.ones((n,), bool)
        isec = raymarch(vol, opts, ray_pos, ray_dir, opts.maxDist,
                        opts.maxIter, smooth=False, active=act,
                        want_normal=False, accel=accel)
        return isec["pos"].to_array(), isec["distance"]

    if args.load_maps:
        z = np.load(args.load_maps)
        apps_a, apps_b, hits = z["apps_a"], z["apps_b"], z["hits"]
        ipos0 = {int(k[5:]): z[k] for k in z.files if k.startswith("ipos0")}
        assert apps_a.shape == (spp, n), (apps_a.shape, spp, n)
    else:
        apps_a = np.zeros((spp, n), np.int64)
        apps_b = np.zeros((spp, n), np.int64)
        hits = np.zeros((spp, n), bool)
        ipos0 = {}
        for p in range(spp):
            op = opts.replace(time=jnp.float32(p * render_mod.TIME_STEP_INIT))
            tt = transpose_table(tables[p])
            maps = jax.device_get(
                pass_maps(vol, op, tt, accel, accum0, ids, zero_cost))
            pos, dist = jax.device_get(pass_primary(vol, op, tt, accel, ids))
            apps_a[p] = maps["a"].astype(np.int64)
            apps_b[p] = maps["b"].astype(np.int64)
            hits[p] = dist < float(opts.maxDist)
            if p % p_stack == 0:
                ipos0[p] = pos  # (n, 3): group-entry Morton source
            print(f"  pass {p + 1}/{spp} collected", file=sys.stderr,
                  flush=True)
        if args.save_maps:
            np.savez_compressed(
                args.save_maps, apps_a=apps_a, apps_b=apps_b, hits=hits,
                **{f"ipos0{k}": v for k, v in ipos0.items()})

    def maxfilt(m, k):
        return np.asarray(_maxfilt2d(jnp.asarray(m.astype(np.int32)), w, k))

    def morton_of(pos):
        scale = 1023.0 / 4.0
        q = lambda c: jnp.clip(
            (jnp.asarray(c) + 2.0) * scale, 0.0, 1023.0).astype(jnp.int32)
        return np.asarray(_morton10(q(pos[:, 0]), q(pos[:, 1]), q(pos[:, 2])))

    # ---- stacked schedule (production: render.py _render_pass_deferred_
    # stacked + the decaying-max group carry) --------------------------------
    st = {"paid_a": 0, "paid_b": 0}
    st_groups = []
    st_var = {"pilot_a": 0, "prev_true": 0, "oracle_row": 0, "hybrid": 0,
              "pilot_hist_max": 0}
    cost = {"a": np.zeros(n, np.int64), "b": np.zeros(n, np.int64)}
    prev_true = np.zeros(n, np.int64)  # prev group's TRUE shade row max
    n_groups = spp // p_stack
    for g in range(n_groups):
        sl = slice(g * p_stack, (g + 1) * p_stack)
        order_a = np.argsort(maxfilt(cost["a"], 3), kind="stable")
        ga = apps_a[sl][:, order_a].T.reshape(-1)  # (n, P) flat: band order
        st["paid_a"] += band_paid(ga, tiles_s)
        # phase-B key: any-pass hit first, cost<<14 | morton>>16, miss tail
        hit_any = hits[sl].any(axis=0)[order_a]
        morton = morton_of(ipos0[g * p_stack])[order_a]
        cost_b = maxfilt(cost["b"], 5)[order_a]

        lane_b = apps_b[sl][:, order_a]  # (P, n)
        miss_tail = np.int64(2**40) + np.arange(n, dtype=np.int64)

        def key_of(bucket):
            return np.where(
                hit_any,
                (np.clip(bucket, 0, 4095).astype(np.int64) << 14)
                | (morton.astype(np.int64) >> 16),
                miss_tail,
            )

        def paid_rows(key):
            pp = np.argsort(key, kind="stable")
            return band_paid(lane_b[:, pp].T.reshape(-1), tiles_s)

        key = key_of(cost_b)
        perm = np.argsort(key, kind="stable")
        paid_g = band_paid(lane_b[:, perm].T.reshape(-1), tiles_s)
        st["paid_b"] += paid_g
        st_groups.append(paid_g)

        # ---- phase-B KEY-QUALITY variants (row granularity held fixed) ----
        # pilot_a: same-group phase-A row-max apps as the bucket — fully
        # realizable (phase A completes before phase B in one program)
        row_a = apps_a[sl][:, order_a].max(axis=0)
        paid_pilot = paid_rows(key_of(row_a))
        st_var["pilot_a"] += paid_pilot
        # prev_true: previous group's TRUE unfiltered shade row max —
        # isolates the 5x5-filter + decay + clip loss from signal staleness
        paid_prevtrue = paid_rows(key_of(prev_true[order_a]))
        st_var["prev_true"] += paid_prevtrue
        # oracle_row: THIS group's true row max, exact sort (key ceiling)
        row_b = lane_b.max(axis=0)
        okey = np.where(hit_any, -row_b, miss_tail)
        st_var["oracle_row"] += paid_rows(okey)
        # hybrid: group 0 has no history -> pilot_a; later groups keep the
        # production history key (the cheapest realistic build)
        st_var["hybrid"] += paid_pilot if g == 0 else paid_g
        # pilot_hist_max: rank-free combination — bucket = max of the two
        # signals' quantile ranks is overkill; use max(hist, pilot scaled
        # to hist's mean) as a cheap composite
        if g == 0:
            st_var["pilot_hist_max"] += paid_pilot
        else:
            s = cost_b.astype(np.float64).mean() / max(
                row_a.astype(np.float64).mean(), 1e-9)
            comp = np.maximum(cost_b, (row_a * s).astype(np.int64))
            st_var["pilot_hist_max"] += paid_rows(key_of(comp))

        # group cost signal: worst pass per pixel, decaying max carry
        new_a = np.zeros(n, np.int64)
        new_a[order_a] = apps_a[sl][:, order_a].max(axis=0)
        new_b = np.zeros(n, np.int64)
        new_b[order_a[perm]] = lane_b[:, perm].max(axis=0)
        prev_true = np.zeros(n, np.int64)
        prev_true[order_a] = row_b
        cost = {k: np.maximum(new, old - (old >> 2))
                for k, new, old in
                [("a", new_a, cost["a"]), ("b", new_b, cost["b"])]}

    # ---- pooled per-LANE phase B (VERDICT r4 weak-7 study) -----------------
    # Phase A stays the production stacked schedule; phase B pools the
    # group's P*n lanes and sorts PER LANE (per-lane hit split; per-pixel
    # cost<<14|morton broadcast to the pixel's P lanes), then bands of R
    # lanes. This is the offline model of compacting stacked secondaries at
    # lane granularity instead of (N, P) rows — the round-4 reflective
    # regression was row-granularity union dilution; this variant has none.
    # `pooled_oracle` sorts by the true apps (the unrealizable upper bound).
    pooled = {r: 0 for r in (2048, 4096, 8192, 16384)}
    pooled_lane = {r: 0 for r in (2048, 4096, 8192, 16384)}
    pooled_oracle = 0
    row_oracle = [0]
    cost = {"a": np.zeros(n, np.int64), "b": np.zeros(n, np.int64)}
    for g in range(n_groups):
        sl = slice(g * p_stack, (g + 1) * p_stack)
        order_a = np.argsort(maxfilt(cost["a"], 3), kind="stable")
        morton = morton_of(ipos0[g * p_stack])[order_a].astype(np.int64)
        cost_b = maxfilt(cost["b"], 5)[order_a].astype(np.int64)
        lane_hit = hits[sl][:, order_a]  # (P, n)
        lane_apps = apps_b[sl][:, order_a]  # (P, n)
        pix_key = (np.clip(cost_b, 0, 4095) << 14) | (morton >> 16)
        lane_key = np.where(
            lane_hit, pix_key[None, :],
            np.int64(2**40)
            + np.arange(p_stack * n, dtype=np.int64).reshape(p_stack, n),
        ).reshape(-1)
        flat = lane_apps.reshape(-1)
        o = np.argsort(lane_key, kind="stable")
        fo = flat[o]
        for r in pooled:
            nb = fo.shape[0] // r
            pooled[r] += int(
                fo[: nb * r].reshape(nb, r).max(axis=1).sum() * r
            ) + int(fo[nb * r:].max(initial=0) * (fo.shape[0] - nb * r))
        # per-LANE realizable key: the lane's own phase-A apps (computed
        # before phase B in the same program) — the only signal that can
        # separate the P lanes of one pixel, which the per-pixel key can't
        lane_a = apps_a[sl][:, order_a]
        key_lane = np.where(
            lane_hit,
            (np.clip(lane_a, 0, 4095) << 14) | (morton[None, :] >> 16),
            np.int64(2**40)
            + np.arange(p_stack * n, dtype=np.int64).reshape(p_stack, n),
        ).reshape(-1)
        fo = flat[np.argsort(key_lane, kind="stable")]
        for r in pooled_lane:
            nb = fo.shape[0] // r
            pooled_lane[r] += int(
                fo[: nb * r].reshape(nb, r).max(axis=1).sum() * r
            ) + int(fo[nb * r:].max(initial=0) * (fo.shape[0] - nb * r))
        oo = np.sort(flat)[::-1]
        r0 = 2048
        nb = oo.shape[0] // r0
        pooled_oracle += int(
            oo[: nb * r0].reshape(nb, r0).max(axis=1).sum() * r0)
        # decomposition: perfect per-PIXEL key at ROW granularity (sort rows
        # by true row max) — isolates per-pixel sorting error from
        # within-pixel across-pass variance (which rows can never shed)
        row_max = lane_apps.max(axis=0)  # (n,)
        ro = lane_apps[:, np.argsort(-row_max, kind="stable")].T.reshape(-1)
        rows_s = n // tiles_s
        row_oracle[0] += int(
            ro.reshape(-1, rows_s * p_stack).max(axis=1).astype(np.int64)
            .sum() * rows_s * p_stack)
        # identical decaying-max carry as the production stacked loop
        hit_any = hits[sl].any(axis=0)[order_a]
        key = np.where(
            hit_any, pix_key,
            np.int64(2**40) + np.arange(n, dtype=np.int64))
        perm = np.argsort(key, kind="stable")
        new_a = np.zeros(n, np.int64)
        new_a[order_a] = apps_a[sl][:, order_a].max(axis=0)
        new_b = np.zeros(n, np.int64)
        new_b[order_a[perm]] = apps_b[sl][:, order_a][:, perm].max(axis=0)
        cost = {k: np.maximum(new, old - (old >> 2))
                for k, new, old in
                [("a", new_a, cost["a"]), ("b", new_b, cost["b"])]}

    # ---- unstacked production schedule (16 passes, decaying-max keys) ------
    un = {"paid_a": 0, "paid_b": 0}
    cost = {"a": np.zeros(n, np.int64), "b": np.zeros(n, np.int64)}
    for p in range(spp):
        order_a = np.argsort(maxfilt(cost["a"], 3), kind="stable")
        un["paid_a"] += band_paid(apps_a[p][order_a], tiles_u)
        key_b = np.clip(maxfilt(cost["b"], 5)[order_a], 0, 4095)
        perm = np.argsort(key_b, kind="stable")  # morton-free approx (doc)
        un["paid_b"] += band_paid(apps_b[p][order_a][perm], tiles_u)
        new_a = np.zeros(n, np.int64)
        new_a[order_a] = apps_a[p][order_a]
        new_b = np.zeros(n, np.int64)
        new_b[order_a[perm]] = apps_b[p][order_a][perm]
        cost = {k: np.maximum(new, old - (old >> 2))
                for k, new, old in
                [("a", new_a, cost["a"]), ("b", new_b, cost["b"])]}

    useful_a = int(apps_a.sum())
    useful_b = int(apps_b.sum())
    floor_ns = 18.0
    out = {
        "config": f"{args.size}^2/{args.mat}/vres{args.vres}/{spp}spp",
        "pass_stack": p_stack,
        "bands": {"stacked_tiles": tiles_s,
                  "stacked_rows": n // tiles_s,
                  "unstacked_tiles": tiles_u},
        "useful": {"march": useful_a, "shade": useful_b},
        "stacked": {
            "paid_march": st["paid_a"], "paid_shade": st["paid_b"],
            "overhead_march": round(st["paid_a"] / max(useful_a, 1), 3),
            "overhead_shade": round(st["paid_b"] / max(useful_b, 1), 3),
            "paid_shade_by_group": st_groups,
            "paid_shade_key_variants": st_var,
        },
        "unstacked": {
            "paid_march": un["paid_a"], "paid_shade": un["paid_b"],
            "overhead_march": round(un["paid_a"] / max(useful_a, 1), 3),
            "overhead_shade": round(un["paid_b"] / max(useful_b, 1), 3),
        },
        "pooled_phase_b": {
            "paid_shade_by_band_lanes": pooled,
            "paid_shade_lane_key_by_band_lanes": pooled_lane,
            "overhead_shade_best": round(
                min(min(pooled.values()), min(pooled_lane.values()))
                / max(useful_b, 1), 3),
            "paid_shade_oracle_2048": pooled_oracle,
            "paid_shade_row_oracle": row_oracle[0],
        },
        "gather_floor_ns": floor_ns,
        "floor_model_s": {
            "stacked": round(
                (st["paid_a"] + st["paid_b"]) * floor_ns * 1e-9, 3),
            "unstacked": round(
                (un["paid_a"] + un["paid_b"]) * floor_ns * 1e-9, 3),
        },
    }
    if args.t_march_ms is not None and st["paid_a"]:
        out["measured_ns_per_paid_app"] = {
            "march": round(args.t_march_ms * 1e6 / st["paid_a"], 1)}
    if args.t_shade_ms is not None and st["paid_b"]:
        out.setdefault("measured_ns_per_paid_app", {})["shade"] = round(
            args.t_shade_ms * 1e6 / st["paid_b"], 1)
    if args.frame_ms is not None:
        out["frame_vs_floor"] = round(
            args.frame_ms / 1e3 / max(out["floor_model_s"]["stacked"], 1e-9),
            2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
