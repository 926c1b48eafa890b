"""A/B of the brick-cache fast rounds (march.BRICK_CACHE) at the headline
config, sweeping CACHE_FAST_ROUNDS. Checks bit-equality of the full frame
against the cache-off engine on the same device before timing.

CPU pre-measurement (64x32/vres 32^2x96 ao): per-lane applications fall to
0.75x (primary march) / 0.65x (shadow marches) at 2 fast rounds, outputs
bit-identical. This script measures whether the paid-application cut
survives band scheduling at spec (the respill lesson: only band-max
reductions turn into frame time).

Usage: python scripts/bench_brick_cache.py [--size 512] [--spp 16]
       [--fast 0,1,2,3]
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
    ap.add_argument("--fast", default="0,2,3")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import march as march_mod
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

    ref = None
    for f in [int(x) for x in args.fast.split(",") if x]:
        march_mod.BRICK_CACHE = f > 0
        march_mod.CACHE_FAST_ROUNDS = max(f, 1)
        render_mod._render_jit.clear_cache()
        out = frame(jnp.float32(0.0))  # compile
        if ref is None:
            ref = out
        else:
            print(f"  bit-equal vs cache-off: {np.array_equal(ref, out)}",
                  flush=True)
        best = 1e9
        for rep in range(args.reps):
            t0 = time.perf_counter()
            frame(jnp.float32(1e-7 * (rep + 1)))
            best = min(best, time.perf_counter() - t0)
        label = "off" if f == 0 else f"fast_rounds={f}"
        print(f"BRICK_CACHE {label}: {best:.3f}s", flush=True)
    march_mod.BRICK_CACHE = False
    march_mod.CACHE_FAST_ROUNDS = 2


if __name__ == "__main__":
    main()
