"""A/B the pass-stacked deferred renderer (render.PASS_STACK — the manual
(N, P) trailing-lane engine) at the headline config, with on-device
equality between variants.

Motivation: scripts/bench_width_scaling.py — a while-body's TRAILING axis
carries independent lanes at strongly sublinear cost (0.88-1.37x for
2-4x lanes), and passes of the same pixel correlate (0.894), so stacking
P passes per band projects ~2-2.5x on the banded phases (PERFORMANCE.md
round-3 session-5; the earlier vmap prototype was slower because vmap
batches at dim 0 — the (N, P) layout is the whole lever).

Usage: python scripts/bench_pass_stack.py [--size 512] [--spp 16]
       [--vres 256] [--mat ao] [--stacks 1,2,4,8] [--reps 2]
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
    ap.add_argument("--stacks", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    print(f"device: {jax.devices()[0]}", flush=True)
    volume_np, vres = default_volume((args.vres,) * 3)
    vol = jnp.asarray(volume_np, jnp.uint8)
    opts = render_options(
        width=args.size, height=args.size, vres=[args.vres] * 3,
        iter=args.spp, mat=args.mat, eyepos=compute_eyepos(120.0, 2.25, 0.4),
    )
    accel = build_accel_for(volume_np, opts)
    tables = make_mc_tables(args.spp, seed=0)
    base_times = jnp.arange(args.spp, dtype=jnp.float32) * 0.333
    acc0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)

    ref = None
    try:
        for p in [int(s) for s in args.stacks.split(",")]:
            if args.spp % p:
                print(f"  P={p}: skipped (spp % P != 0)")
                continue
            render_mod.PASS_STACK = p
            fn = jax.jit(
                lambda v, o, t, tm, a0, ac: render_mod.render_accum(
                    v, o, t, tm, a0, accel=ac
                )
            )
            out = fn(vol, opts, tables, base_times, acc0, accel)
            a = np.asarray(out)  # compile + fetch
            best = 1e9
            for rep in range(args.reps):
                t = base_times + jnp.float32(1e-6 * (rep + 1))
                t0 = time.perf_counter()
                np.asarray(fn(vol, opts, tables, t, acc0, accel))
                best = min(best, time.perf_counter() - t0)
            if ref is None:
                ref = a
                eq = "(ref)"
            else:
                d = np.abs(a - ref).max()
                eq = "BIT-EQUAL" if (a == ref).all() else f"max abs diff {d:.3e}"
            print(f"  P={p}: {best:.3f} s   {eq}", flush=True)
    finally:
        render_mod.PASS_STACK = 1


if __name__ == "__main__":
    main()
