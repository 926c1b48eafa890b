"""Generic A/B of a module-level scheduling flag at the headline config.

Renders the full frame per flag value (fresh jit per variant — the flags
are trace-time constants, CLAUDE.md), checks bit-equality against the
first variant on-device, and reports best-of-N fetch-timed seconds.

Usage:
  python scripts/bench_flag_ab.py --flag march.WIDE_GROUND
  python scripts/bench_flag_ab.py --flag march.FLAT_UNROLL --values 4,8,16
  python scripts/bench_flag_ab.py --flag render.COMPACT_SECONDARY --size 256 --spp 4
"""

import argparse
import ast
import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flag", required=True,
                    help="<module>.<NAME> with module in "
                         "{march, render, accel, shade}")
    ap.add_argument("--values", default="False,True",
                    help="comma list of python literals")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--volume", default="gyroid",
                    help="gyroid | scatter (config 4's mesh-scatter volume)")
    ap.add_argument("--set", action="append", default=[],
                    help="extra module.FLAG=literal assignments applied "
                         "BEFORE the accel build (repeatable), e.g. "
                         "--set accel.ONEHOT_MAX_ROWS=0")
    args = ap.parse_args()

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import accel as accel_ns
    from raymarchcl_tpu.ops import march as march_ns
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops import shade as shade_ns
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    mods = {"march": march_ns, "render": render_mod, "accel": accel_ns,
            "shade": shade_ns}
    modname, flag = args.flag.split(".")
    mod = mods[modname]
    saved = getattr(mod, flag)
    presets = []
    for assign in args.set:
        target, raw = assign.split("=", 1)
        m, f = target.split(".")
        presets.append((mods[m], f, getattr(mods[m], f)))
        setattr(mods[m], f, ast.literal_eval(raw))
        print(f"preset {target}={raw}", flush=True)

    if args.volume in ("scatter", "mesh64"):
        import os

        from raymarchcl_tpu.models import mesh

        stl = os.path.join(os.path.dirname(__file__), "..", "assets",
                           "trefoil.stl")
        if args.volume == "scatter":
            volume_np = mesh.voxelize_scatter(mesh.read_stl(stl), args.vres,
                                              seed=3)
        else:  # config 3's 64^3 voxelized-mesh scene (MXU one-hot regime)
            volume_np = mesh.voxelize_ks(mesh.read_stl(stl), args.vres, 1)
        vres = (args.vres,) * 3
    else:
        volume_np, vres = default_volume((args.vres,) * 3)
    vol = jnp.asarray(volume_np, jnp.uint8)
    opts = render_options(
        width=args.size, height=args.size, vres=list(vres), iter=args.spp,
        mat=args.mat, eyepos=compute_eyepos(135.0, 2.25, 0.35),
        targetpos=[0, -0.4, 0],
    )
    accel = build_accel_for(volume_np, opts)
    tables = make_mc_tables(args.spp, seed=0)
    base_times = jnp.arange(args.spp, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)

    def frame(eps):
        argb, _ = render_mod._render_jit(
            vol, opts, tables, base_times + eps, accum0, accel
        )
        return np.asarray(argb)

    ref = None
    try:
        for raw in args.values.split(","):
            val = ast.literal_eval(raw)
            setattr(mod, flag, val)
            render_mod._render_jit.clear_cache()
            t0 = time.perf_counter()
            out = frame(jnp.float32(0.0))  # compile
            compile_s = time.perf_counter() - t0
            eq = "" if ref is None else (
                f"  bit-equal={np.array_equal(ref, out)}"
            )
            if ref is None:
                ref = out
            best = 1e9
            for rep in range(args.reps):
                t0 = time.perf_counter()
                frame(jnp.float32(1e-7 * (rep + 1)))
                best = min(best, time.perf_counter() - t0)
            print(
                f"{args.flag}={raw}: {best:.3f}s"
                f" (compile {compile_s:.0f}s){eq}", flush=True,
            )
    finally:
        setattr(mod, flag, saved)
        for m, f, v in presets:
            setattr(m, f, v)
        render_mod._render_jit.clear_cache()


if __name__ == "__main__":
    main()
