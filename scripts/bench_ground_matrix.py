"""(WIDE_GROUND x FLAT_GROUND_STEPS) matrix at the headline.

Why this matrix exists: the wide ground block (march.WIDE_GROUND) changes
the economics of ground-unroll depth the same way WIDE_SUBSTEPS changed
substep depth. Serially each ground step issues ~90 ops, so depth 4 was
the measured optimum (deeper cancels its own savings). Wide, the per-step
cost collapses to a ~5-op serial dist ladder plus one (N, S) block whose
trailing dim is ~free below 128 — so deeper unrolls retire more ground
steps per application at near-constant body cost, and depth must be
re-swept WITH the wide block on.

Each variant clears the render jit cache (both knobs are trace-time
constants), checks bit-equality on-device against the first variant, and
reports best-of-N fetch-timed seconds.

Usage: python scripts/bench_ground_matrix.py [--variants F:4,T:4,T:8,T:16]
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
    ap.add_argument("--variants", default="F:4,T:4,T:8,T:16",
                    help="comma list of wide_ground:ground_steps")
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

    saved = (march_mod.WIDE_GROUND, march_mod.FLAT_GROUND_STEPS)
    ref = None
    try:
        for spec in args.variants.split(","):
            w, g = spec.split(":")
            march_mod.WIDE_GROUND = w.upper().startswith("T")
            march_mod.FLAT_GROUND_STEPS = int(g)
            render_mod._render_jit.clear_cache()

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
            print(
                f"wide_ground={march_mod.WIDE_GROUND} "
                f"GROUND_STEPS={int(g):2d}: {best:.3f}s "
                f"(compile {compile_s:.0f}s){eq}",
                flush=True,
            )
    finally:
        march_mod.WIDE_GROUND, march_mod.FLAT_GROUND_STEPS = saved
        render_mod._render_jit.clear_cache()


if __name__ == "__main__":
    main()
