"""March brick-edge (accel.set_brick) A/B at the headline config.

The while-body cost model (PERFORMANCE.md round-3 late session) says an
application costs ~op-count x issue-cost and the row gather is ~10 us of
~112 us — so a 16^3 brick, which halves the number of applications a ray
needs (each staged brick answers 2x the path length) while its 128-word
STOP plane rides the ~free trailing 128-lane axis (word-select A/B),
should cut march+shadow time even though each row gather is 4x wider.

Rebuilds the accel table per edge (set_brick is build-time AND trace-time)
and checks bit-equality on-device against the first variant.

Usage: python scripts/bench_brick_edge.py [--edges 8,16] [--substeps 6]
       [--size 512] [--spp 16]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--edges", default="8,16")
    ap.add_argument("--substeps", default="",
                    help="optional per-edge substeps, parallel to --edges "
                         "(default: keep accel.BRICK_SUBSTEPS)")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import accel as accel_mod
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    volume_np, vres = default_volume((args.vres,) * 3)
    vol = jnp.asarray(volume_np, jnp.uint8)
    opts = render_options(
        width=args.size, height=args.size, vres=list(vres), iter=args.spp,
        mat=args.mat, eyepos=compute_eyepos(135.0, 2.25, 0.35),
        targetpos=[0, -0.4, 0],
    )
    tables = make_mc_tables(args.spp, seed=0)
    base_times = jnp.arange(args.spp, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)

    edges = [int(e) for e in args.edges.split(",") if e]
    subs = [int(s) for s in args.substeps.split(",") if s]
    assert not subs or len(subs) == len(edges)
    saved_edge, saved_sub = accel_mod.BRICK, accel_mod.BRICK_SUBSTEPS

    ref = None
    try:
        for i, edge in enumerate(edges):
            accel_mod.set_brick(edge)
            if subs:
                accel_mod.BRICK_SUBSTEPS = subs[i]
            accel = build_accel_for(volume_np, opts)
            render_mod._render_jit.clear_cache()

            def frame(eps):
                argb, _ = render_mod._render_jit(
                    vol, opts, tables, base_times + eps, accum0, accel
                )
                return np.asarray(argb)

            t0 = time.perf_counter()
            out = frame(jnp.float32(0.0))  # compile
            compile_s = time.perf_counter() - t0
            eq = "" if ref is None else f"  bit-equal={np.array_equal(ref, out)}"
            if ref is None:
                ref = out
            best = 1e9
            for rep in range(args.reps):
                t0 = time.perf_counter()
                frame(jnp.float32(1e-7 * (rep + 1)))
                best = min(best, time.perf_counter() - t0)
            print(
                f"BRICK={edge:2d} SUBSTEPS={accel_mod.BRICK_SUBSTEPS}: "
                f"{best:.3f}s (compile {compile_s:.0f}s, "
                f"rows {tuple(accel.rows.shape)}){eq}",
                flush=True,
            )
    finally:
        accel_mod.set_brick(saved_edge)
        accel_mod.BRICK_SUBSTEPS = saved_sub
        render_mod._render_jit.clear_cache()


if __name__ == "__main__":
    main()
