"""On-hardware bit-equality invariant checker (VERDICT round-1 item 7).

Asserts, on the REAL TPU chip, that every scheduling/acceleration
optimization is output-EXACT (the CPU test suite can only check these with
tolerance — XLA:CPU contracts FMAs context-dependently):

  1. distance-field accel + flat raymarch engine on/off
  2. screen-band scan tiling (tiles=1 vs auto)
  3. Morton-sorted deferred shading on/off
  4. host_slices=1 vs 4
  5. brick edge 16 vs 8 (accel.set_brick; Accel.edge retraces by itself)
  7. wide substep resolve on/off (march.WIDE_SUBSTEPS)
  8. wide ground block on/off (march.WIDE_GROUND)
  9. active-lane-compacted secondary loops on/off
     (render.COMPACT_SECONDARY; metal's bounces engage the compact path)
 10. pass-stacked trailing-lane engine on/off (render.PASS_STACK; needs a
     bounce-free preset + >= 2*TILE_RAYS px, run on a 128x64 ao config)
 11. per-loop history keys for the compacted secondaries on/off
     (render.LOOP_KEYS; metal's bounce/shadow loops engage them)

Emits ONE JSON line; run before each BENCH (results recorded in
PERFORMANCE.md).

Usage: python scripts/tpu_invariants.py [--size 128] [--vres 128] [--spp 2]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--vres", type=int, default=96)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--mat", default="metal")  # exercises reflections
    ap.add_argument("--only", default=None,
                    help="comma list of invariant names to run (compile "
                         "budget per invocation on the hosted tunnel)")
    args = ap.parse_args()
    wanted = set(args.only.split(",")) if args.only else None

    def run_inv(name):
        return wanted is None or name in wanted

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    dev = jax.devices()[0]
    volume_np, vres = default_volume((args.vres,) * 3)
    vol = jnp.asarray(volume_np, jnp.uint8)
    opts = render_options(
        width=args.size, height=args.size, vres=list(vres), iter=args.spp,
        mat=args.mat, eyepos=compute_eyepos(135.0, 2.25, 0.35),
        targetpos=[0, -0.4, 0],
    )
    accel = build_accel_for(volume_np, opts)
    tables = make_mc_tables(args.spp, seed=0)

    results = {}
    t0 = time.perf_counter()

    def record(name, a, b):
        eq = np.array_equal(np.asarray(a), np.asarray(b))
        results[name] = bool(eq)
        print(f"  {name}: {'OK' if eq else 'MISMATCH'}", file=sys.stderr, flush=True)

    # reference rendering: accel + deferred + auto tiles + 1 slice
    ref, ref_accum = render_mod.render_image(vol, opts, tables, accel=accel)

    if run_inv("accel_on_off"):
        a, _ = render_mod.render_image(vol, opts, tables, accel=None)
        record("accel_on_off", ref, a)

    # Module-level scheduling flags (DEFERRED_SHADE / TILE_RAYS / ...)
    # are read at TRACE time and are NOT part of the jit key: flipping one
    # without clearing the jit cache silently reuses the old program and the
    # comparison is vacuous (measured: zero retraces without clear_cache —
    # which means the round-2 recorded runs of deferred_on_off and
    # band_tiling_on_off compared a program against itself; both invariants
    # re-verified genuinely after this fix).
    def flag_flip(**flags):
        saved = {k: getattr(render_mod, k) for k in flags}
        for k, v in flags.items():
            setattr(render_mod, k, v)
        render_mod._render_jit.clear_cache()
        return saved

    if run_inv("deferred_on_off"):
        saved = flag_flip(DEFERRED_SHADE=False)
        try:
            b, _ = render_mod.render_image(vol, opts, tables, accel=accel)
            record("deferred_on_off", ref, b)
        finally:
            flag_flip(**saved)

    if run_inv("band_tiling_on_off"):
        saved = flag_flip(TILE_RAYS=opts.num_pixels + 1)  # forces tiles=1
        try:
            c, _ = render_mod.render_image(vol, opts, tables, accel=accel)
            record("band_tiling_on_off", ref, c)
        finally:
            flag_flip(**saved)

    if run_inv("host_slices_1_vs_4"):
        d, _ = render_mod.render_image(vol, opts, tables, accel=accel,
                                       host_slices=4)
        record("host_slices_1_vs_4", ref, d)

    if run_inv("brick_edge_16"):
        # Accel.edge is static jit-key aux: no cache clear needed, the
        # 130-word table retraces by itself (ops/accel.set_brick)
        from raymarchcl_tpu.ops import accel as accel_mod

        accel_mod.set_brick(16)
        try:
            acc16 = build_accel_for(volume_np, opts)
        finally:
            accel_mod.set_brick(8)
        g, _ = render_mod.render_image(vol, opts, tables, accel=acc16)
        record("brick_edge_16", ref, g)

    if run_inv("wide_substeps_on_off"):
        # march-module flag (trace-time, needs the cache clear)
        from raymarchcl_tpu.ops import march as march_mod

        saved_ws = march_mod.WIDE_SUBSTEPS
        try:
            march_mod.WIDE_SUBSTEPS = not saved_ws
            render_mod._render_jit.clear_cache()
            w, _ = render_mod.render_image(vol, opts, tables, accel=accel)
            record("wide_substeps_on_off", ref, w)
        finally:
            march_mod.WIDE_SUBSTEPS = saved_ws
            render_mod._render_jit.clear_cache()

    if run_inv("wide_ground_on_off"):
        from raymarchcl_tpu.ops import march as march_mod

        saved_wg = march_mod.WIDE_GROUND
        try:
            march_mod.WIDE_GROUND = not saved_wg
            render_mod._render_jit.clear_cache()
            w, _ = render_mod.render_image(vol, opts, tables, accel=accel)
            record("wide_ground_on_off", ref, w)
        finally:
            march_mod.WIDE_GROUND = saved_wg
            render_mod._render_jit.clear_cache()

    if run_inv("pass_stack_on_off"):
        # the stacked trailing-lane engine needs a bounce-free preset and
        # >= 2*TILE_RAYS pixels; 128x64 ao with 4 passes engages it
        opts_ps = render_options(
            width=128, height=64, vres=list(vres), iter=4, mat="ao",
            eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
        )
        tables4 = make_mc_tables(4, seed=0)
        saved_ps = render_mod.PASS_STACK
        try:
            render_mod.PASS_STACK = 1
            render_mod._render_jit.clear_cache()
            s0, _ = render_mod.render_image(vol, opts_ps, tables4, accel=accel)
            render_mod.PASS_STACK = saved_ps if saved_ps > 1 else 4
            render_mod._render_jit.clear_cache()
            s1, _ = render_mod.render_image(vol, opts_ps, tables4, accel=accel)
            record("pass_stack_on_off", s0, s1)
        finally:
            render_mod.PASS_STACK = saved_ps
            render_mod._render_jit.clear_cache()

    if run_inv("compact_secondary_on_off"):
        # metal (reflectIter=3) engages the compact path; ref has it ON
        saved = flag_flip(COMPACT_SECONDARY=False)
        try:
            k, _ = render_mod.render_image(vol, opts, tables, accel=accel)
            record("compact_secondary_on_off", ref, k)
        finally:
            flag_flip(**saved)

    if run_inv("stack_reflective_on_off"):
        # per-lane pooled stacked reflective engine (render.py
        # STACK_REFLECTIVE) vs the unstacked compacted path; the metal ref
        # at iter=2 engages stacking (p_eff=2), so flip it OFF and compare
        saved = flag_flip(STACK_REFLECTIVE=False)
        try:
            k, _ = render_mod.render_image(vol, opts, tables, accel=accel)
            record("stack_reflective_on_off", ref, k)
        finally:
            flag_flip(**saved)

    if run_inv("prepass_on_off"):
        # group-0 cold-start prepass (render.PREPASS_STRIDE); needs a
        # coarse grid >= 1024 cells -> 128^2 at stride 4 (the 96^2 ref
        # scene gates it off)
        opts_pp = render_options(
            width=128, height=128, vres=list(vres), iter=4, mat="ao",
            eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
        )
        tables4 = make_mc_tables(4, seed=0)
        saved = flag_flip(PREPASS_STRIDE=0)
        try:
            p0, _ = render_mod.render_image(vol, opts_pp, tables4, accel=accel)
        finally:
            flag_flip(**saved)
        p1, _ = render_mod.render_image(vol, opts_pp, tables4, accel=accel)
        record("prepass_on_off", p0, p1)

    if run_inv("loop_keys_on_off"):
        # per-loop history keys for the compacted secondaries (metal
        # engages them; 2 passes so pass 2 renders with trained keys)
        saved = flag_flip(LOOP_KEYS=not render_mod.LOOP_KEYS)
        try:
            k, _ = render_mod.render_image(vol, opts, tables, accel=accel)
            record("loop_keys_on_off", ref, k)
        finally:
            flag_flip(**saved)

    ok = all(results.values())
    print(
        json.dumps(
            {
                "invariants": results,
                "ok": ok,
                "device": str(dev),
                "platform": dev.platform,
                "config": f"{args.size}^2 {args.spp}spp {args.mat} vres{args.vres}",
                "seconds": round(time.perf_counter() - t0, 1),
            }
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
