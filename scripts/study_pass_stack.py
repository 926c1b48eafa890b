"""Offline oracle for PASS-STACKED shade/march bands.

Idea (round-3 late session): render S spp passes TOGETHER by stacking them
along the lane axis — a band of TILE_RAYS lanes holds TILE_RAYS/S pixels
x S jitters. Per the while-body cost model, a round costs the same at any
width <= TILE_RAYS, so total time tracks TOTAL ROUNDS = sum over bands of
band-max applications:

  sequential: S passes x sum over bands of P=TILE_RAYS pixels of max
  stacked:    1 super-pass x sum over bands of P/S pixels of max over the
              S jitters

Same pixels under different jitters have highly correlated costs
(corr ~0.89, PERFORMANCE.md), so the stacked max ~ the single-pass max,
while the pixel granularity halves/quarters — strictly finer banding at
constant issue width. This script measures the exact paid-application
arithmetic on REAL per-pass app maps (K production passes, cost-sorted
exactly like the engine), reporting the predicted round ratio per phase
for S in {1, 2, 4, ...}.

Usage: python scripts/study_pass_stack.py [--size 256] [--passes 4] [--cpu]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def paid_stacked(apps_kn, order, band_px, tile):
    """apps_kn: (S, N) per-pass apps of the SAME pixels; order: (N,) band
    order (shared across the stack — the engine sorts once per super-pass);
    band_px: pixels per band. Returns sum over bands of (max over band
    pixels x S jitters) — the stacked super-pass's total rounds x lanes,
    in units of lane-applications at width tile."""
    a = np.asarray(apps_kn)[:, order]  # (S, N)
    nb = a.shape[1] // band_px
    m = a[:, : nb * band_px].reshape(a.shape[0], nb, band_px).max(axis=(0, 2))
    return int(m.astype(np.int64).sum()) * tile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.render import _maxfilt2d, auto_tiles
    from raymarchcl_tpu.ops.sampling import make_mc_tables, transpose_table
    from raymarchcl_tpu.options import render_options

    volume_np, vres = default_volume((args.vres,) * 3)
    vol = jnp.asarray(volume_np, jnp.uint8)
    opts = render_options(
        width=args.size, height=args.size, vres=list(vres), iter=args.passes,
        mat=args.mat, eyepos=compute_eyepos(135.0, 2.25, 0.35),
        targetpos=[0, -0.4, 0],
    )
    accel = build_accel_for(volume_np, opts)
    tables = make_mc_tables(args.passes, seed=0)
    n = opts.num_pixels
    tile = auto_tiles(n)  # auto_tiles guarantees n % tile == 0
    ids = jnp.arange(n, dtype=jnp.int32)
    accum0 = jnp.zeros((n, 3), jnp.float32)
    zero = {"a": jnp.zeros((n,), jnp.int32), "b": jnp.zeros((n,), jnp.int32)}

    # device arrays as jit ARGS, not closure captures (CLAUDE.md
    # dispatch-poison gotcha)
    @jax.jit
    def run(vol, opts, tables, accel, ids, accum0, cost):
        maps = []
        for k in range(args.passes):
            _, m = render_mod._render_pass_deferred(
                vol, opts, transpose_table(tables[k]), accum0, ids, accel,
                tile, prev_cost=cost,
            )
            maps.append(m)
            cost = jax.tree_util.tree_map(
                lambda new, old: jnp.maximum(new, old - (old >> 2)), m, cost
            )
        return maps

    maps = jax.device_get(run(vol, opts, tables, accel, ids, accum0, zero))
    w = args.size
    band_px = n // tile  # pixels per band at S=1 (= TILE_RAYS granularity)

    out = {"config": f"{args.size}^2/{args.mat}", "tile_lanes": band_px,
           "passes": args.passes}
    for phase, filt in (("a", 3), ("b", 5)):
        # sort key exactly like the engine: max-filtered previous-pass map
        # (pass 0's map sorts passes 1..K — offline approximation of the
        # decaying-max carry)
        key = np.asarray(_maxfilt2d(jnp.asarray(maps[0][phase]), w, filt))
        order = np.argsort(key, kind="stable")
        apps = np.stack([m[phase] for m in maps[1:]])  # sorted passes only
        k = apps.shape[0]
        res = {}
        seq = sum(
            paid_stacked(apps[i : i + 1], order, band_px, band_px)
            for i in range(k)
        )
        res["S=1 (sequential)"] = seq
        s = 2
        while s <= k:
            stacked = sum(
                paid_stacked(apps[i : i + s], order, band_px // s, band_px)
                for i in range(0, k - k % s, s)
            ) * k / (k - k % s)
            res[f"S={s}"] = round(stacked)
            res[f"S={s}_ratio"] = round(stacked / seq, 3)
            s *= 2
        useful = int(apps.astype(np.int64).sum())
        res["useful"] = useful
        res["S=1_overhead"] = round(seq / useful, 3)
        out[{"a": "march", "b": "shade"}[phase]] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
