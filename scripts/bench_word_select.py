"""A/B of the binary word-select tree (march.WORD_SELECT_TREE) at the
headline config. The tree replaces the (N, W)-broadcast one-hot
compare+sum word extraction in the march substep loop (W=16, 6x per
application) and the superbrick normal window (W=54, 50x per normal) with
log2(W) halving selects — identical u32 words (tests cover both), ~3x
fewer lanes touched. Tests whether the serial-body-content cost the
brick-cache A/B exposed responds to slimming the fattest extraction ops.

Usage: python scripts/bench_word_select.py [--size 512] [--spp 16]
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
    for tree in (False, True):
        march_mod.WORD_SELECT_TREE = tree
        render_mod._render_jit.clear_cache()
        out = frame(jnp.float32(0.0))  # compile
        if ref is None:
            ref = out
        else:
            print(f"  bit-equal: {np.array_equal(ref, out)}", flush=True)
        best = 1e9
        for rep in range(args.reps):
            t0 = time.perf_counter()
            frame(jnp.float32(1e-7 * (rep + 1)))
            best = min(best, time.perf_counter() - t0)
        print(f"WORD_SELECT_TREE={tree}: {best:.3f}s", flush=True)
    march_mod.WORD_SELECT_TREE = True


if __name__ == "__main__":
    main()
