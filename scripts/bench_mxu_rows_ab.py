"""A/B the MXU one-hot row fetch against the XLA gather at a given config.

The one-hot matmul path (march._mxu_rows) was tuned on 64^3 scenes
(NB=512 bricks: 25% frame win) and gated at ONEHOT_MAX_ROWS=4096 —
config 4's 128^3 scatter volume sits EXACTLY at that gate (16^3 = 4096
bricks), where each fetch costs lanes x 4096 MACs x 72 byte-planes on the
MXU vs one ~72 B row gather on the scalar path. This script measures both
on the same scene by nulling Accel.rows_mxu/nrm_mxu (pytree structure
changes, so each variant retraces by itself).

Usage: python scripts/bench_mxu_rows_ab.py [--size 512] [--spp 4]
         [--vres 128] [--mat metal] [--volume scatter]
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
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--vres", type=int, default=128)
    ap.add_argument("--mat", default="metal")
    ap.add_argument("--volume", default="scatter",
                    help="scatter (config 4) | gyroid")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    if args.volume == "scatter":
        import os

        from raymarchcl_tpu.models import mesh

        stl = os.path.join(os.path.dirname(__file__), "..", "assets",
                           "trefoil.stl")
        volume_np = mesh.voxelize_scatter(mesh.read_stl(stl), args.vres,
                                          seed=3)
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
    variants = [
        ("mxu rows+nrm", accel),
        ("gather rows (nrm mxu kept)",
         accel.replace(rows_mxu=None)),
        ("gather rows+nrm", accel.replace(rows_mxu=None, nrm_mxu=None)),
    ]
    if accel.rows_mxu is None:
        print(f"volume {vres} exceeds ONEHOT_MAX_ROWS — nothing to A/B")
        return
    tables = make_mc_tables(args.spp, seed=0)
    base_times = jnp.arange(args.spp, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)

    ref = None
    for name, acc in variants:
        def frame(eps):
            argb, _ = render_mod._render_jit(
                vol, opts, tables, base_times + eps, accum0, acc
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
        print(f"{name}: {best:.3f}s (compile {compile_s:.0f}s){eq}",
              flush=True)


if __name__ == "__main__":
    main()
