"""TILE_RAYS (band size) sweep under the cost-sorted regime at the headline
resolution (VERDICT r2 item 9: the 1024-ray optimum predates cost sorting).

Usage: python scripts/bench_tileray_sweep.py [--size 512] [--spp 4]
       [--tiles 512,1024,2048,4096]
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
    ap.add_argument("--tiles", default="512,1024,2048,4096")
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
    accum0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)

    def frame(eps):
        argb, _ = render_mod._render_jit(
            vol, opts, tables, base_times + eps, accum0, accel
        )
        return np.asarray(argb)

    saved_max = render_mod.MAX_TILES
    for tr in [int(t) for t in args.tiles.split(",") if t]:
        render_mod.TILE_RAYS = tr
        # MAX_TILES=256 floors the band size at n/256 (1024 at 512^2);
        # lift it so the sweep actually reaches smaller bands
        render_mod.MAX_TILES = max(saved_max, opts.num_pixels // tr)
        render_mod._render_jit.clear_cache()
        frame(jnp.float32(0.0))  # compile
        best = 1e9
        for rep in range(args.reps):
            t0 = time.perf_counter()
            frame(jnp.float32(1e-7 * (rep + 1)))
            best = min(best, time.perf_counter() - t0)
        tiles = render_mod.auto_tiles(opts.num_pixels)
        print(
            f"TILE_RAYS={tr:5d} ({tiles} bands of "
            f"{opts.num_pixels // tiles}): {best:.3f}s", flush=True
        )
    render_mod.MAX_TILES = saved_max


if __name__ == "__main__":
    main()
