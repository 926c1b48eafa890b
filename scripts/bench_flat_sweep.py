"""FLAT_UNROLL / FLAT_GROUND_STEPS sweep at the headline config.

Both constants were tuned under TILE_RAYS=1024 (round 2); the round-3 flip
to 4096-lane bands changes the tail-waste arithmetic (each while round now
wastes FLAT_UNROLL x 4096 lane-applications on the band's finished lanes),
so re-sweep under the shipped schedule. Grouping-only: per-lane operation
sequences are identical at any unroll — bit-equality is unaffected (the
fori body is idempotent for DONE lanes, see march._raymarch_flat).

Usage: python scripts/bench_flat_sweep.py [--size 512] [--spp 16]
       [--unrolls 4,8,16] [--ground 4]
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
    ap.add_argument("--unrolls", default="4,8,16")
    ap.add_argument("--ground", default="4")
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
    for gs in [int(g) for g in args.ground.split(",") if g]:
        for u in [int(u) for u in args.unrolls.split(",") if u]:
            assert u % 2 == 0, "FLAT_UNROLL must be even (2x-unrolled fori body)"
            march_mod.FLAT_UNROLL = u
            march_mod.FLAT_GROUND_STEPS = gs
            render_mod._render_jit.clear_cache()
            out = frame(jnp.float32(0.0))  # compile
            if ref is None:
                ref = out
            else:
                # grouping-only invariant: identical frames on TPU
                eq = np.array_equal(ref, out)
                print(f"  bit-equal vs first variant: {eq}", flush=True)
            best = 1e9
            for rep in range(args.reps):
                t0 = time.perf_counter()
                frame(jnp.float32(1e-7 * (rep + 1)))
                best = min(best, time.perf_counter() - t0)
            print(
                f"FLAT_UNROLL={u:3d} FLAT_GROUND_STEPS={gs}: {best:.3f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
