"""Animation steady-state + preview timing on the CURRENT engine
(VERDICT r4 item 9 — the recorded 1.19-1.26 s/frame figure predates two
engine generations).

Reference workflow: the 35-frame turntable (core.clj:181-213) — camera eye
is a streamed float leaf of RenderOpts, so every frame after the first
reuses the compiled program. Times N steady-state frames through the real
api.test_anim frame loop shape (render_image with per-frame opts), plus the
preview-budget single frame (README.org:26-38 REPL look-dev loop).

Usage: python scripts/bench_anim.py [--size 512] [--spp 2] [--vres 256]
       [--frames 6] [--cpu]
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from raymarchcl_tpu import api
    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    volume, vres = default_volume((args.vres,) * 3)
    accel = build_accel_for(
        volume,
        render_options(width=8, height=8, vres=list(vres), iter=1,
                       mat=args.mat),
    )
    vol = jnp.asarray(volume, jnp.uint8).reshape(-1)
    tables = make_mc_tables(args.spp, seed=0)
    times = jnp.arange(args.spp, dtype=jnp.float32) * render_mod.TIME_STEP_ANIM

    def frame_opts(frame, n_frames):
        t = frame / n_frames  # api.test_anim camera path (core.clj:192-201)
        return render_options(
            width=args.size, height=args.size, vres=list(vres),
            iter=args.spp, mat=args.mat, fov=115.0, targetpos=[0, -0.15, 0],
            eyepos=compute_eyepos(t * 350.0, 2.25, 0.44 + t * 0.01),
        )

    accum = jnp.zeros((args.size * args.size, 3), jnp.float32)
    # frame 0: compile (eyepos is a float leaf -> frames 1+ reuse the program)
    t0 = time.perf_counter()
    argb, accum = render_mod.render_image(
        vol, frame_opts(0, 35), tables, times, accum, accel=accel)
    compile_s = time.perf_counter() - t0

    per_frame = []
    for f in range(1, args.frames + 1):
        t0 = time.perf_counter()
        argb, accum = render_mod.render_image(
            vol, frame_opts(f, 35), tables, times, accum, accel=accel)
        np.asarray(argb)
        per_frame.append(time.perf_counter() - t0)

    # preview mode (api.PREVIEW_BUDGETS): quarter budgets + 1 spp at 256^2
    popts = render_options(
        width=256, height=256, vres=list(vres), iter=1, mat=args.mat,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
        **api.PREVIEW_BUDGETS,
    )
    ptab = make_mc_tables(1, seed=0)
    pacc = jnp.zeros((256 * 256, 3), jnp.float32)
    render_mod.render_image(vol, popts, ptab, accum=pacc, accel=accel)  # compile
    pt = []
    for rep in range(3):
        po = popts.replace(time=jnp.float32(1e-6 * rep))
        t0 = time.perf_counter()
        argb, _ = render_mod.render_image(vol, po, ptab, accum=pacc,
                                          accel=accel)
        np.asarray(argb)
        pt.append(time.perf_counter() - t0)

    print(json.dumps({
        "anim_config": f"{args.size}^2/{args.spp}spp/{args.mat}",
        "first_frame_incl_compile_s": round(compile_s, 2),
        "steady_state_s_per_frame": [round(x, 3) for x in per_frame],
        "steady_state_median_s": round(sorted(per_frame)[len(per_frame) // 2], 3),
        "preview_256_s": round(min(pt), 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
