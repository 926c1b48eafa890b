"""Parameter sweep harness for the TPU chip: MARCH_CHUNK, GROUND_STEPS,
DIST_UNROLL, accel on/off. Run on hardware; prints a sorted table.

Usage: python scripts/tune.py [--size 256] [--spp 1] [--vres 256] [--mat ao]
"""

import argparse
import itertools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def time_config(vol, volume_np, opts, tables, chunk, ground, unroll, use_accel, reps=2):
    from raymarchcl_tpu.ops import accel as accel_mod
    from raymarchcl_tpu.ops import march, render as render_mod

    march.MARCH_CHUNK = chunk
    march.GROUND_STEPS = ground
    march.DIST_UNROLL = unroll
    acc = (
        accel_mod.build_accel(volume_np, opts.voxelRes, opts.isoVal)
        if use_accel
        else None
    )
    # fresh jit (module constants changed)
    fn = jax.jit(
        lambda v, o, t, tm, a0, ac: (
            render_mod.pack_argb(o, render_mod.render_accum(v, o, t, tm, a0, accel=ac))
        )
    )
    spp = tables.shape[0]
    accum0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)
    base_times = jnp.arange(spp, dtype=jnp.float32) * 0.333
    out = fn(vol, opts, tables, base_times, accum0, acc)
    np.asarray(out)
    samples = []
    for rep in range(reps):
        tm = base_times + jnp.float32(1e-7 * (rep + 1))
        t0 = time.perf_counter()
        np.asarray(fn(vol, opts, tables, tm, accum0, acc))
        samples.append(time.perf_counter() - t0)
    return min(samples)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--chunks", default="16")
    ap.add_argument("--grounds", default="16")
    ap.add_argument("--unrolls", default="2,4,8")
    ap.add_argument("--accels", default="0,1")
    args = ap.parse_args()

    from raymarchcl_tpu.api import default_volume
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

    rows = []
    grid = list(
        itertools.product(
            [int(x) for x in args.chunks.split(",")],
            [int(x) for x in args.grounds.split(",")],
            [int(x) for x in args.unrolls.split(",")],
            [int(x) for x in args.accels.split(",")],
        )
    )
    for chunk, ground, unroll, use_accel in grid:
        try:
            dt = time_config(vol, volume_np, opts, tables, chunk, ground, unroll, use_accel)
            rows.append((dt, chunk, ground, unroll, use_accel))
            print(f"chunk={chunk:<3} ground={ground:<3} unroll={unroll} accel={use_accel}: "
                  f"{dt*1e3:8.1f} ms", flush=True)
        except Exception as e:
            print(f"chunk={chunk} ground={ground} unroll={unroll}: FAILED {e}",
                  flush=True)
    rows.sort()
    print("\nbest configs:")
    for dt, chunk, ground, unroll, use_accel in rows[:5]:
        print(f"  {dt*1e3:8.1f} ms  chunk={chunk} ground={ground} unroll={unroll} "
              f"accel={use_accel}")


if __name__ == "__main__":
    main()
