"""Stage-budget profiler: frame-time ablation on real hardware.

Measures the full render and a ladder of reduced variants so stage costs
fall out by subtraction:

  full                      everything
  no-lights                 numLights=0 (kills shadow marches + direct light)
  no-lights-min-ao          + aoIter=0 (1 AO probe instead of 6)
  march+normals             primary raymarch with smooth normals only
  march-only                primary raymarch, no normal estimation

Usage: python scripts/profile_stages.py [--size 256] [--spp 1] [--vres 256]
       [--mat ao] [--accel 1]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, args, reps=3, perturb=None):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile
    best = 1e9
    for rep in range(reps):
        a = perturb(args, rep) if perturb else args
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*a))[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--accel", type=int, default=1)
    args = ap.parse_args()

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import camera_ray_lookat, compute_eyepos
    from raymarchcl_tpu.ops.march import raymarch
    from raymarchcl_tpu.ops.sampling import init_render_state, make_mc_tables, transpose_table
    from raymarchcl_tpu.options import render_options

    volume_np, vres = default_volume((args.vres,) * 3)
    vol = jnp.asarray(volume_np, jnp.uint8)

    def opts_for(**kw):
        return render_options(
            width=args.size, height=args.size, vres=list(vres), iter=args.spp,
            mat=args.mat, eyepos=compute_eyepos(135.0, 2.25, 0.35),
            targetpos=[0, -0.4, 0], **kw,
        )

    opts = opts_for()
    accel = build_accel_for(volume_np, opts) if args.accel else None
    tables = make_mc_tables(args.spp, seed=0)
    accum0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)
    base_times = jnp.arange(args.spp, dtype=jnp.float32) * 0.333

    render = jax.jit(
        lambda v, o, t, tm, a0, ac: render_mod.pack_argb(
            o, render_mod.render_accum(v, o, t, tm, a0, accel=ac)
        )
    )

    def perturb(a, rep):
        return a[:3] + (a[3] + jnp.float32(1e-7 * (rep + 1)),) + a[4:]

    rows = []

    def run(name, o):
        dt = time_fn(render, (vol, o, tables, base_times, accum0, accel), perturb=perturb)
        rows.append((name, dt))
        print(f"  {name:22s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    full = run("full", opts)
    run("no-lights", opts_for(numLights=0))
    run("no-lights-min-ao", opts_for(numLights=0, aoIter=0))

    # primary march in screen bands (the deferred pipeline's phase A)
    def march_fn(want_normal):
        def f(v, o, table_t, ids, ac, eps):
            tiles = render_mod.auto_tiles(ids.shape[0])
            nt = ids.shape[0] // tiles

            def band(_, ids_t):
                state = init_render_state(o, table_t, ids_t)
                rp, rd = camera_ray_lookat(o, state)
                isec = raymarch(
                    v, o.replace(time=o.time + eps), rp, rd, o.maxDist, o.maxIter,
                    smooth=True, active=jnp.ones(ids_t.shape, bool),
                    want_normal=want_normal, accel=ac,
                )
                out = isec["distance"]
                if want_normal:
                    out = out + isec["normal"].x
                return None, out

            return jax.lax.scan(band, None, ids.reshape(tiles, nt))[1]

        return jax.jit(f)

    ids = jnp.arange(opts.num_pixels, dtype=jnp.int32)
    table_t = transpose_table(tables[0])
    for name, wn in (("march+normals", True), ("march-only", False)):
        fn = march_fn(wn)
        dt = time_fn(
            fn, (vol, opts, table_t, ids, accel, jnp.float32(0.0)),
            perturb=lambda a, rep: a[:5] + (jnp.float32(1e-7 * (rep + 1)),),
        )
        dt *= args.spp  # single-pass fn; scale to frame
        rows.append((name, dt))
        print(f"  {name:22s} {dt*1e3:9.1f} ms (x{args.spp} pass)", flush=True)

    d = dict(rows)
    print("\nstage estimates:")
    print(f"  lights+shadows   {(d['full'] - d['no-lights'])*1e3:9.1f} ms")
    print(f"  ao (beyond 1 probe){(d['no-lights'] - d['no-lights-min-ao'])*1e3:7.1f} ms")
    print(f"  smooth normals   {(d['march+normals'] - d['march-only'])*1e3:9.1f} ms")
    print(f"  primary march    {d['march-only']*1e3:9.1f} ms")
    print(
        f"  shade fixed rest {(d['no-lights-min-ao'] - d['march+normals'])*1e3:9.1f} ms"
    )


if __name__ == "__main__":
    main()
