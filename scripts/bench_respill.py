"""A/B the carry-state respill shade scheduler (ops/render.RESPILL) on real
hardware at the headline config (VERDICT r2 item 2: prototype against the
measured 2.3x -> 1.22x shade-oracle gap).

Usage: python scripts/bench_respill.py [--size 512] [--spp 4] [--vres 256]
       [--caps 3,6,12] [--reps 2]

Each configuration is a fresh jit program (RESPILL/RESPILL_CAP are
module-level statics); timings are fetch-timed with per-rep input
perturbation (PERFORMANCE.md platform notes).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--caps", default="3,6,12")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--check", action="store_true",
                    help="also assert respill == baseline bit-equal")
    args = ap.parse_args()

    from raymarchcl_tpu.api import build_accel_for, default_volume
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
    accel = build_accel_for(volume_np, opts)
    tables = make_mc_tables(args.spp, seed=0)
    base_times = jnp.arange(args.spp, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)

    def frame(eps):
        argb, _ = render_mod._render_jit(
            vol, opts, tables, base_times + eps, accum0, accel
        )
        return np.asarray(argb)

    def timed():
        frame(jnp.float32(0.0))  # compile
        best = 1e9
        for rep in range(args.reps):
            t0 = time.perf_counter()
            frame(jnp.float32(1e-7 * (rep + 1)))
            best = min(best, time.perf_counter() - t0)
        return best

    render_mod.RESPILL = False
    base = timed()
    ref_img = frame(jnp.float32(0.0)) if args.check else None
    print(f"baseline (no respill): {base:.3f}s", flush=True)

    render_mod.RESPILL = True
    for cap in [int(c) for c in args.caps.split(",") if c]:
        render_mod.RESPILL_CAP = cap
        # new cap -> new program: clear the jit cache entry by re-wrapping
        render_mod._render_jit.clear_cache()
        dt = timed()
        note = ""
        if args.check:
            eq = np.array_equal(frame(jnp.float32(0.0)), ref_img)
            note = f"  bit-equal={eq}"
        print(
            f"respill cap={cap:3d}: {dt:.3f}s  ({base / dt:.3f}x){note}",
            flush=True,
        )


if __name__ == "__main__":
    main()
