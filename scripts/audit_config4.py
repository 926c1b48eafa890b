"""Per-secondary-loop paid-vs-useful audit for the config-4 workload.

The config-4 stage ladder (scripts/profile_config4.py, v5e) showed the
metal+reflections frame is ~75% shadow marches (primary + bounce-hit) and
~18% bounce marches, and that the wide march levers barely move it. This
audit decomposes each of the 12 secondary while_loops per pass (3 bounce
marches, 2 primary-shadow marches, 6 bounce-shadow marches, + primary) into

    useful apps   sum of per-lane applications
    paid apps     sum-over-bands of band-max x band size (what the
                  while_loop actually charges; PERFORMANCE.md cost model)
    active lanes  lanes the loop marches at all

with the production band order reconstructed exactly (phase-A 3x3-max
sort, phase-B cost<<14|morton key, hit/miss split) for pass 2 of a 2-pass
run, like scripts/audit_apps.py. Per-lane apps are independent of banding,
so each loop is measured once on the full frame and re-banded offline.

Usage: python scripts/audit_config4.py [--size 256] [--vres 128] [--mat metal]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--vres", type=int, default=128)
    ap.add_argument("--mat", default="metal")
    ap.add_argument("--volume", default="scatter",
                    help="scatter (config 4) | gyroid (headline-style)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--study-keys", action="store_true",
                    help="also evaluate per-loop history keys (pass-1 "
                         "per-loop apps, 5x5 max filter) as each loop's "
                         "within-active compaction order")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import os

    from raymarchcl_tpu.api import build_accel_for
    from raymarchcl_tpu.models import mesh
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops import shade
    from raymarchcl_tpu.ops.camera import camera_ray_lookat, compute_eyepos
    from raymarchcl_tpu.ops.march import raymarch
    from raymarchcl_tpu.ops.render import _maxfilt2d, _morton10, auto_tiles
    from raymarchcl_tpu.ops.sampling import (
        init_render_state, make_mc_tables, transpose_table)
    from raymarchcl_tpu.ops.vecmath import V3, dot, normalize, reflect, where3
    from raymarchcl_tpu.options import render_options

    if args.volume == "gyroid":
        from raymarchcl_tpu.api import default_volume

        volume_np, _ = default_volume((args.vres,) * 3)
    else:
        stl = os.path.join(os.path.dirname(__file__), "..", "assets",
                           "trefoil.stl")
        volume_np = mesh.voxelize_scatter(mesh.read_stl(stl), args.vres,
                                          seed=3)
    vol = jnp.asarray(volume_np, jnp.uint8)
    opts = render_options(
        width=args.size, height=args.size, vres=[args.vres] * 3, iter=2,
        mat=args.mat, eyepos=compute_eyepos(135.0, 2.25, 0.35),
        targetpos=[0, -0.4, 0],
    )
    accel = build_accel_for(volume_np, opts)
    tables = make_mc_tables(2, seed=0)
    n = opts.num_pixels
    tiles = auto_tiles(n)
    while tiles > 1 and (n % tiles != 0 or n // tiles < 512):
        tiles //= 2
    nt = n // tiles
    w = args.size
    ids = jnp.arange(n, dtype=jnp.int32)
    accum0 = jnp.zeros((n, 3), jnp.float32)
    zero = {"a": jnp.zeros((n,), jnp.int32), "b": jnp.zeros((n,), jnp.int32)}
    times = jnp.arange(2, dtype=jnp.float32) * render_mod.TIME_STEP_INIT

    # pass 1 cost maps (production path)
    @jax.jit
    def pass1(vol, opts, table, accel, accum0, ids, zero):
        return render_mod._render_pass_deferred(
            vol, opts, transpose_table(table), accum0, ids, accel, tiles,
            prev_cost=zero,
        )[1]

    maps1 = jax.device_get(
        pass1(vol, opts.replace(time=times[0]), tables[0], accel, accum0, ids,
              zero))
    # decaying-max carry after pass 1 (render_accum step): max(new, 0) = new
    prev_cost = maps1

    # pass-2 band orders, reproduced exactly (render.py:270-311)
    opts2 = opts.replace(time=times[1])
    table_t2 = transpose_table(tables[1])
    order_a = np.argsort(np.asarray(
        _maxfilt2d(jnp.asarray(prev_cost["a"]), w, 3)), kind="stable")
    ids2 = jnp.asarray(np.arange(n, dtype=np.int32)[order_a])

    # full-frame pass-2 stages, each loop's apps kept separate
    @jax.jit
    def stage_all(vol, opts, table_t, ids_t, accel):
        out = {}
        state = init_render_state(opts, table_t, ids_t)
        ray_pos, ray_dir = camera_ray_lookat(opts, state)
        act = jnp.ones((ids_t.shape[0],), bool)
        isec = raymarch(
            vol, opts, ray_pos, ray_dir, opts.maxDist, opts.maxIter,
            smooth=True, active=act, want_normal=True, accel=accel,
            want_stats=True,
        )
        out["primary_march"] = (isec["apps"], act)
        px, py, mcn = state["px"], state["py"], state["mc_normal"]

        hit = isec["distance"] < opts.maxDist
        mat_idx = jnp.clip(isec["object_id"], 0, 3)
        _, r0, smoothness = shade._mat_gather(opts, mat_idx)
        norm_p = isec["normal"] + mcn * (1.0 / (smoothness * 200.0 + 5.0))

        # bounce chain (shade_after_march:405-428), stats per loop
        b_active = hit & (r0 > 0.0)
        r_dir, r_pos, r_norm = ray_dir, isec["pos"], norm_p
        pos_of = {}
        for b in range(opts.reflectIter):
            r_dir = where3(b_active, reflect(r_dir, r_norm), r_dir)
            borig = r_pos + r_dir * 0.0075
            bisec = raymarch(
                vol, opts, borig, r_dir, opts.maxDist, opts.maxIter,
                smooth=False, active=b_active, want_normal=True, accel=accel,
                want_stats=True,
            )
            out[f"bounce{b}_march"] = (bisec["apps"], b_active)
            pos_of[f"bounce{b}_march"] = jnp.stack([borig.x, borig.y, borig.z])
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
                out[f"bounce{b}_shadow{li}"] = (sapps, l["act"])
                pos_of[f"bounce{b}_shadow{li}"] = jnp.stack(
                    [l["origin"].x, l["origin"].y, l["origin"].z])
            b_r0 = jnp.take(opts.mat_r0, bmat)
            b_active = b_active & bh & (b_r0 >= 0.001)
            r_pos, r_norm = bisec["pos"], bisec["normal"]

        # primary lighting shadows
        lt = shade.light_geometry(
            opts, table_t, px, py, isec["pos"], ray_dir, norm_p, hit)
        for li, l in enumerate(lt):
            _, sapps = shade.shadow(
                vol, opts, l["origin"], l["ldir"], l["lmax"], l["act"],
                accel, want_stats=True,
            )
            out[f"primary_shadow{li}"] = (sapps, l["act"])
            pos_of[f"primary_shadow{li}"] = jnp.stack(
                [l["origin"].x, l["origin"].y, l["origin"].z])

        return out, isec["pos"], isec["distance"], pos_of

    out, ipos, idist, pos_of = stage_all(vol, opts2, table_t2, ids2, accel)
    out = jax.device_get(out)
    pos_of = jax.device_get(pos_of)
    ipos = jax.device_get(jnp.stack([ipos.x, ipos.y, ipos.z]))
    idist = np.asarray(idist)

    # phase-B permutation (render.py:297-311), offline
    hit = idist < float(np.float32(opts.maxDist))
    scale = 1023.0 / 4.0
    qk = lambda c: np.clip((c + 2.0) * scale, 0.0, 1023.0).astype(np.int64)
    morton = np.asarray(_morton10(
        jnp.asarray(qk(ipos[0]), jnp.int32), jnp.asarray(qk(ipos[1]), jnp.int32),
        jnp.asarray(qk(ipos[2]), jnp.int32))).astype(np.int64)
    cost_b = np.asarray(
        _maxfilt2d(jnp.asarray(prev_cost["b"]), w, 5))[order_a].astype(np.int64)
    key_hit = (np.clip(cost_b, 0, 4095) << 14) | (morton >> 16)
    key = np.where(hit, key_hit, 2**30 + np.arange(n, dtype=np.int64))
    perm = np.argsort(key, kind="stable")

    def band_paid(apps):
        a = np.asarray(apps)[perm].reshape(tiles, nt)
        return int(a.max(axis=1).astype(np.int64).sum() * nt)

    def band_paid_order(apps, order):
        a = np.asarray(apps)[order].reshape(tiles, nt)
        return int(a.max(axis=1).astype(np.int64).sum() * nt)

    # realizable in-pass signals for within-active ordering: each loop keyed
    # on an ALREADY-COMPUTED march's apps from the same pass
    signal_of = {"bounce0_march": "primary_march"}
    for b in range(1, 8):
        signal_of[f"bounce{b}_march"] = f"bounce{b-1}_march"
    for b in range(8):
        for li in range(4):
            signal_of[f"bounce{b}_shadow{li}"] = f"bounce{b}_march"
            signal_of[f"primary_shadow{li}"] = "primary_march"

    rows = {}
    tu = tp = tc = to = tk = 0
    for name, (apps, act) in out.items():
        apps = np.asarray(apps)
        act = np.asarray(act)
        if name == "primary_march":
            # phase A runs in order_a bands, pre-perm
            a = apps.reshape(tiles, nt)
            paid = int(a.max(axis=1).astype(np.int64).sum() * nt)
            paid_c = paid_o = paid_k = paid
        else:
            paid = band_paid(apps)
            # compaction: stable partition actives-first ON TOP of the
            # production perm (keeps the cost-sort order within classes)
            act_p = act[perm]
            comp = np.argsort(~act_p, kind="stable")
            paid_c = band_paid_order(apps[perm], comp)
            # compaction + oracle (sort actives by their true apps)
            okey = np.where(act, -apps, 1)  # actives desc-by-cost first
            paid_o = band_paid_order(apps, np.argsort(okey, kind="stable"))
            # compaction + realizable same-pass key
            sig_name = signal_of.get(name)
            if sig_name and sig_name in out:
                sig = np.asarray(out[sig_name][0]).astype(np.int64)
                kkey = np.where(act, sig, np.int64(1) << 40)
                paid_k = band_paid_order(apps, np.argsort(kkey, kind="stable"))
            else:
                paid_k = paid_c
        useful = int(apps.astype(np.int64).sum())
        nact = int(act.sum())
        rows[name] = dict(
            useful=useful, paid=paid,
            overhead=round(paid / max(useful, 1), 2),
            paid_compact=paid_c,
            paid_compact_key=paid_k,
            paid_compact_oracle=paid_o,
            active=nact,
            per_active=round(useful / max(nact, 1), 1),
        )
        if name != "primary_march":
            tu += useful
            tp += paid
            tc += paid_c
            to += paid_o
            tk += paid_k
    rows["TOTAL_secondary"] = dict(
        useful=tu, paid=tp, overhead=round(tp / max(tu, 1), 2),
        paid_compact=tc, paid_compact_key=tk, paid_compact_oracle=to,
        compact_cut=round(tp / max(tc, 1), 2),
        key_cut=round(tp / max(tk, 1), 2))

    if args.study_keys:
        # per-loop HISTORY keys: pass 1 re-run with per-loop stats (natural
        # pixel order), each pass-2 loop compacted+ordered by the 5x5-max
        # filter of ITS OWN pass-1 apps (what a per-loop decaying-max carry
        # would provide)
        out1 = jax.device_get(stage_all(
            vol, opts.replace(time=times[0]), transpose_table(tables[0]),
            jnp.arange(n, dtype=jnp.int32), accel)[0])

        def mkey(name):
            # per-loop Morton code of the loop's own ray origin
            p3 = pos_of[name]
            return np.asarray(_morton10(
                jnp.asarray(qk(p3[0]), jnp.int32),
                jnp.asarray(qk(p3[1]), jnp.int32),
                jnp.asarray(qk(p3[2]), jnp.int32))).astype(np.int64)

        def paid_banded(apps, order, rows_per_band):
            a = np.asarray(apps)[order]
            nb = n // rows_per_band
            a = a.reshape(nb, rows_per_band)
            return int(a.max(axis=1).astype(np.int64).sum() * rows_per_band)

        variants = {"hist": 0, "hist_morton": 0, "morton": 0}
        band_sweep = {1024: 0, 2048: 0, 4096: 0}
        hist_rows = {}
        for name, (apps, act) in out.items():
            if name == "primary_march" or name not in out1:
                continue
            apps = np.asarray(apps)
            act = np.asarray(act)
            prev = np.asarray(_maxfilt2d(
                jnp.asarray(np.asarray(out1[name][0])), w, 5))
            k = prev[order_a].astype(np.int64)  # pass-2 lanes are order_a
            mk = mkey(name)
            keys = {
                "hist": np.where(act, k, np.int64(1) << 40),
                "hist_morton": np.where(
                    act, (np.clip(k, 0, 4095) << 14) | (mk >> 16),
                    np.int64(1) << 40),
                "morton": np.where(act, mk, np.int64(1) << 40),
            }
            for vn, key in keys.items():
                paid_h = band_paid_order(apps, np.argsort(key, kind="stable"))
                variants[vn] += paid_h
                if vn == "hist":
                    hist_rows[name] = paid_h
            # band-size sweep under the composite key
            o = np.argsort(keys["hist_morton"], kind="stable")
            for bsz in band_sweep:
                band_sweep[bsz] += paid_banded(apps, o, bsz)
        rows["history_key_paid"] = hist_rows
        rows["TOTAL_secondary"]["paid_history_key"] = variants["hist"]
        rows["TOTAL_secondary"]["history_cut"] = round(
            tp / max(variants["hist"], 1), 2)
        rows["TOTAL_secondary"]["paid_hist_morton"] = variants["hist_morton"]
        rows["TOTAL_secondary"]["paid_morton_only"] = variants["morton"]
        rows["TOTAL_secondary"]["hist_morton_band_sweep"] = band_sweep
    print(json.dumps(dict(
        config=f"{args.size}^2/{args.mat}/vres{args.vres}/scatter",
        tiles=tiles, rows=rows), indent=1))


if __name__ == "__main__":
    main()
