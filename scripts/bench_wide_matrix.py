"""(WIDE_SUBSTEPS x BRICK_SUBSTEPS x brick edge) matrix at the headline.

Why this matrix exists: the wide substep resolve (march.WIDE_SUBSTEPS)
changes the ECONOMICS of substep depth. Serially, each extra substep costs
~65 issued ops, so deeper unrolls cancel their own application savings
(the round-2 BRICK_SUBSTEPS 6->8/12/16 sweep measured ~0). Wide, an extra
substep only widens trailing dims (~free below (N, 128) per the round-3
cost model), while applications per lane — the quantity band while-rounds
are made of — drop with substep depth (offline audit_apps: 16^3@16 = 0.66x
paid apps). So substeps and edge must be re-swept WITH the wide resolve.

Each variant rebuilds the accel table, clears the render jit cache (all
three knobs are trace-time constants), checks bit-equality on-device
against the first variant, and reports best-of-N fetch-timed seconds.

Usage: python scripts/bench_wide_matrix.py \
         [--variants F:6:8,T:6:8,T:12:8,T:16:8,T:12:16,T:16:16]
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
    ap.add_argument("--variants", default="F:6:8,T:6:8,T:12:8,T:16:8,T:12:16,T:16:16",
                    help="comma list of wide:substeps:edge")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import accel as accel_mod
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
    tables = make_mc_tables(args.spp, seed=0)
    base_times = jnp.arange(args.spp, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)

    saved = (march_mod.WIDE_SUBSTEPS, accel_mod.BRICK_SUBSTEPS, accel_mod.BRICK)
    ref = None
    try:
        for spec in args.variants.split(","):
            w, s, e = spec.split(":")
            march_mod.WIDE_SUBSTEPS = w.upper().startswith("T")
            accel_mod.BRICK_SUBSTEPS = int(s)
            accel_mod.set_brick(int(e))
            accel = build_accel_for(volume_np, opts)
            render_mod._render_jit.clear_cache()

            def frame(eps):
                argb, _ = render_mod._render_jit(
                    vol, opts, tables, base_times + eps, accum0, accel
                )
                return np.asarray(argb)

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
                f"wide={march_mod.WIDE_SUBSTEPS} SUBSTEPS={int(s):2d} "
                f"BRICK={int(e):2d}: {best:.3f}s (compile {compile_s:.0f}s)"
                f"{eq}",
                flush=True,
            )
    finally:
        march_mod.WIDE_SUBSTEPS, accel_mod.BRICK_SUBSTEPS = saved[0], saved[1]
        accel_mod.set_brick(saved[2])
        render_mod._render_jit.clear_cache()


if __name__ == "__main__":
    main()
