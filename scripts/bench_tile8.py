"""Measure the PER-CHIP cost of an 8-way pixel-tiled headline render on ONE
chip (VERDICT r2 item 4): render a 512x64 row block with GLOBAL pixel ids —
exactly the program an 8-chip mesh member runs — so the v5e-8 projection is
(measured 1/8-tile time) + collective overhead instead of assumed-linear
arithmetic. Captures the band-granularity penalty (32k rays/chip -> fewer,
coarser cost-sorted bands).

Usage: python scripts/bench_tile8.py [--size 512] [--spp 16] [--slices 8]
       [--slice-index 3]
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
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--slice-index", type=int, default=-1,
                    help="-1 = measure every slice (the mesh's frame time "
                    "is the max; slices differ: sky rows are cheap)")
    ap.add_argument("--reps", type=int, default=2)
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
    n = opts.num_pixels
    ns = n // args.slices

    def run_slice(s):
        ids = jnp.arange(s * ns, (s + 1) * ns, dtype=jnp.int32)
        accum0 = jnp.zeros((ns, 3), jnp.float32)

        def go(eps):
            out = render_mod._render_slice_jit(
                vol, opts, tables, base_times + eps, accum0, ids, accel
            )
            return np.asarray(out)

        go(jnp.float32(0.0))  # compile (cached across slices: same shapes)
        best = 1e9
        for rep in range(args.reps):
            t0 = time.perf_counter()
            go(jnp.float32(1e-7 * (rep + 1)))
            best = min(best, time.perf_counter() - t0)
        return best

    if args.slice_index >= 0:
        todo = [args.slice_index]
    else:
        todo = list(range(args.slices))
    ts = []
    for s in todo:
        dt = run_slice(s)
        ts.append(dt)
        print(f"  slice {s}/{args.slices}: {dt:.3f}s", flush=True)
    print(
        f"{args.size}^2 {args.spp}spp {args.mat} over {args.slices} chips: "
        f"worst slice {max(ts):.3f}s, mean {sum(ts)/len(ts):.3f}s "
        f"(frame time on a {args.slices}-chip mesh ~= worst slice + gather)"
    )


if __name__ == "__main__":
    main()
