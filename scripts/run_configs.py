"""Run the 5 BASELINE.json benchmark configs on hardware and emit a results
table (markdown to stdout + one JSON line each to stderr).

Config 5 calls for tiling across a v5e-4; on this single-chip environment it
runs single-chip (the tiled path is validated on a virtual mesh by
tests/test_parallel.py and __graft_entry__.dryrun_multichip). spp can be
scaled down with --spp-scale N for quicker runs (time scales linearly in
spp; the table records the actual spp used).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def render_timed(volume, vres, spp, host_chunk=4, host_slices=1, **kw):
    from raymarchcl_tpu.api import build_accel_for
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    opts = render_options(vres=list(vres), iter=spp, **kw)
    accel = build_accel_for(volume, opts)
    vol = jnp.asarray(volume, jnp.uint8)
    tables = make_mc_tables(spp, seed=0)
    times = jnp.arange(spp, dtype=jnp.float32) * render_mod.TIME_STEP_INIT

    def frame(eps):
        accum = jnp.zeros((opts.num_pixels, 3), jnp.float32)
        argb = None
        for c0 in range(0, spp, host_chunk):
            c1 = min(c0 + host_chunk, spp)
            argb, accum = render_mod.render_image(
                vol, opts, tables[c0:c1], times[c0:c1] + eps, accum,
                accel=accel, host_slices=host_slices,
            )
        return argb

    frame(jnp.float32(0.0))
    t0 = time.perf_counter()
    frame(jnp.float32(1e-7))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp-scale", type=int, default=1,
                    help="divide each config's spp by this (>=1)")
    ap.add_argument("--host-chunk", type=int, default=16,
                    help="passes per device program (bench.py uses 16 = one "
                         "program at the headline). Small chunks hobble the "
                         "stacked engine (p_eff <= chunk) and reset the "
                         "cost-sort history at every chunk boundary.")
    args = ap.parse_args()
    s = max(1, args.spp_scale)

    from raymarchcl_tpu.api import default_volume
    from raymarchcl_tpu.models import mesh
    from raymarchcl_tpu.ops.camera import compute_eyepos

    gy256, _ = default_volume((256,) * 3)
    cam = dict(eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0])

    # configs 3/4 run the committed organic mesh asset (18k vertices,
    # scripts/make_mesh_asset.py) through the real STL -> voxelize path,
    # mirroring the reference's bunny/dragon workflow (meshvoxel.clj:25-69)
    import os

    stl = os.path.join(os.path.dirname(__file__), "..", "assets", "trefoil.stl")
    verts = mesh.read_stl(stl)
    bunny64 = mesh.voxelize_ks(verts, 64, 1)
    dragon = mesh.voxelize_scatter(verts, 128, seed=3)

    configs = [
        ("1: gyroid 224^2 1spp primary/flat-ish (ao)",
         dict(volume=gy256, vres=(256,) * 3, spp=1, width=224, height=224,
              mat="ao", **cam)),
        ("2: gyroid 512^2 AO+fog 25spp",
         dict(volume=gy256, vres=(256,) * 3, spp=max(1, 25 // s), width=512,
              height=512, mat="ao", fogPow=0.1, **cam)),
        ("3: voxelized mesh 64^3 smooth normals 16spp",
         dict(volume=bunny64, vres=(64,) * 3, spp=max(1, 16 // s), width=512,
              height=512, mat="ao", eyepos=compute_eyepos(120, 2.0, 0.5),
              targetpos=[0, 0, 0])),
        ("4: dragon-style volume, metal + reflections 16spp",
         dict(volume=dragon, vres=(128,) * 3, spp=max(1, 16 // s), width=512,
              height=512, mat="metal", **cam)),
        ("5: gyroid 1024^2 DOF+metal 100spp (single chip here)",
         dict(volume=gy256, vres=(256,) * 3, spp=max(1, 100 // (s * 25)),
              width=1024, height=1024, mat="metal", dof=0.025,
              host_slices=4, **cam)),
    ]

    rows = []
    for name, cfg in configs:
        volume = cfg.pop("volume")
        vres = cfg.pop("vres")
        spp = cfg.pop("spp")
        hs = cfg.pop("host_slices", 1)
        try:
            dt = render_timed(volume, vres, spp, host_chunk=args.host_chunk,
                              host_slices=hs, **cfg)
            rows.append((name, cfg["width"], cfg["height"], spp, dt))
            print(json.dumps({"config": name, "spp": spp, "seconds": round(dt, 3)}),
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": str(e)[:200]}),
                  file=sys.stderr, flush=True)
    print("\n| config | resolution | spp | seconds | s/spp-Mpixel |")
    print("|---|---|---|---|---|")
    for name, w, h, spp, dt in rows:
        norm = dt / (spp * w * h / 1e6)
        print(f"| {name} | {w}x{h} | {spp} | {dt:.2f} | {norm:.2f} |")


if __name__ == "__main__":
    main()
