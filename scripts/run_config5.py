"""BASELINE config 5 at FULL spec: 1024x1024, metal, dof=0.025, 100 spp
(the reference's showcase workload — README.org:63-64 100-spp DOF renders).

Runs through io/checkpoint.render_checkpointed so the render survives
interruption and RESUMES across invocations (re-run the script until it
reports done). Emits per-chunk timing JSON lines and a final s/spp figure;
writes the PNG next to the checkpoint.

Usage: python scripts/run_config5.py [--ckpt /tmp/cfg5] [--chunk 10]
       [--spp 100] [--minutes 8]   (stops cleanly after ~minutes; resume)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/cfg5")
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--minutes", type=float, default=8.0)
    args = ap.parse_args()

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.io import imageio
    from raymarchcl_tpu.io.checkpoint import render_checkpointed
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    volume_np, vres = default_volume((256,) * 3)
    opts = render_options(
        width=1024, height=1024, vres=list(vres), iter=args.spp, mat="metal",
        dof=0.025, eyepos=compute_eyepos(135.0, 2.25, 0.35),
        targetpos=[0, -0.4, 0],
    )
    accel = build_accel_for(volume_np, opts)
    vol = jnp.asarray(volume_np, jnp.uint8)
    tables = make_mc_tables(args.spp, seed=0)

    t_start = time.perf_counter()
    done_passes = []

    def progress(c1, n):
        dt = time.perf_counter() - t_start
        done_passes.append(c1)
        print(json.dumps({"passes_done": c1, "of": n,
                          "elapsed_s": round(dt, 1)}), flush=True)
        if dt > args.minutes * 60 and c1 < n:
            print(json.dumps({"paused_at": c1,
                              "resume": "re-run scripts/run_config5.py"}),
                  flush=True)
            sys.exit(3)

    argb, accum = render_checkpointed(
        vol, opts, tables, args.ckpt, chunk=args.chunk, progress=progress,
        accel=accel,
    )
    total = time.perf_counter() - t_start
    out_png = str(args.ckpt) + ".png"
    imageio.save_png(np.asarray(argb), out_png)
    n_this_run = (done_passes[-1] - (done_passes[0] - args.chunk)) if done_passes else 0
    print(json.dumps({
        "config": "5: 1024^2 metal dof=0.025",
        "spp": args.spp,
        "passes_this_run": n_this_run,
        "seconds_this_run": round(total, 1),
        "s_per_spp_this_run": round(total / max(n_this_run, 1), 2),
        "png": out_png,
    }), flush=True)


if __name__ == "__main__":
    main()
