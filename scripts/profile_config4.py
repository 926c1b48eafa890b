"""Config-4 stage profiler: ablation ladder for the metal+reflections scene.

Config 4 (BASELINE: "dragon voxel grid with metal/reflective materials,
1 reflection bounce, 16 spp") is the normalized-cost outlier — 9.4
s/spp-Mpixel vs 1.3-1.9 for the ao configs on the wide engine — and it
barely moved (-1.6%) when the wide march levers cut the ao headline 26%.
This ladder decomposes the frame by disabling stages (all static fields,
so each variant is its own program):

  full                metal: 2 lights, reflectIter=3, aoIter=5
  reflect1            reflectIter=1 (the spec's "1 reflection bounce")
  reflect0            reflectIter=0
  light1              numLights=1
  light0              numLights=0 (kills shadow marches + direct light)
  reflect0+light0     only primary march + AO + atmosphere
  reflect0+light0+ao0 primary march only (+fixed)

Usage: python scripts/profile_config4.py [--spp 4] [--size 512] [--vres 128]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, args, reps=2, perturb=None):
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--vres", type=int, default=128)
    args = ap.parse_args()

    import os

    from raymarchcl_tpu.api import build_accel_for
    from raymarchcl_tpu.models import mesh
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    stl = os.path.join(os.path.dirname(__file__), "..", "assets", "trefoil.stl")
    volume_np = mesh.voxelize_scatter(mesh.read_stl(stl), args.vres, seed=3)

    vol = jnp.asarray(volume_np, jnp.uint8)

    def opts_for(**kw):
        return render_options(
            width=args.size, height=args.size, vres=[args.vres] * 3,
            iter=args.spp, mat="metal",
            eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
            **kw,
        )

    opts = opts_for()
    accel = build_accel_for(volume_np, opts)
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

    variants = [
        ("full", {}),
        ("reflect1", dict(reflectIter=1)),
        ("reflect0", dict(reflectIter=0)),
        ("light1", dict(numLights=1)),
        ("light0", dict(numLights=0)),
        ("reflect0+light0", dict(reflectIter=0, numLights=0)),
        ("reflect0+light0+ao0", dict(reflectIter=0, numLights=0, aoIter=0)),
    ]
    d = {}
    for name, kw in variants:
        dt = time_fn(render, (vol, opts_for(**kw), tables, base_times, accum0, accel),
                     perturb=perturb)
        d[name] = dt
        print(f"  {name:22s} {dt*1e3:9.1f} ms", flush=True)

    print("\nstage estimates:")
    print(f"  bounces 2+3        {(d['full'] - d['reflect1'])*1e3:9.1f} ms")
    print(f"  bounce 1           {(d['reflect1'] - d['reflect0'])*1e3:9.1f} ms")
    print(f"  all reflections    {(d['full'] - d['reflect0'])*1e3:9.1f} ms")
    print(f"  light 2 (of 2)     {(d['full'] - d['light1'])*1e3:9.1f} ms")
    print(f"  lights+shadows     {(d['full'] - d['light0'])*1e3:9.1f} ms")
    print(f"  ao                 {(d['reflect0+light0'] - d['reflect0+light0+ao0'])*1e3:9.1f} ms")
    print(f"  march+fixed        {d['reflect0+light0+ao0']*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
