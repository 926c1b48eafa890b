"""Paid-vs-useful application audit at the headline config (one v5e).

Cost model (PERFORMANCE.md round-2/3): a band's while_loop charges every
lane every round until the band's WORST lane finishes, so the PAID
application count of a phase is sum-over-bands of (band-max apps x band
size), while the USEFUL count is the sum of per-lane apps. The respill
experiment established that frame time tracks paid rounds (cap-insensitive
reassignment conserved time), so

    achieved ns / paid application  =  phase time / paid apps

is the per-application cost actually being paid, and its distance from the
platform's in-program row-gather floor (~18 ns effective, PERFORMANCE.md
round-2) bounds the remaining per-application headroom — the only lever
family left open after the scheduling experiments.

Band reconstruction: phase A's order (argsort of 3x3-max-filtered previous
apps) is reproduced exactly; phase B's order drops the Morton tiebreak
(unavailable offline — it permutes lanes only WITHIN equal-cost groups, so
band statistics shift only where a cost group straddles a band edge) and
the hit/miss split (miss lanes march zero shadow apps and land in the tail
either way), making paid_b a close approximation, flagged as such.

Usage: python scripts/audit_apps.py [--size 512] [--spp-probe 3]
Writes one JSON line; per-phase times come from the recorded stage budget
(PERFORMANCE.md round-3) unless --no-times.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def band_paid(apps_in_band_order, tiles):
    a = np.asarray(apps_in_band_order)
    nt = a.shape[0] // tiles
    return int(a.reshape(tiles, nt).max(axis=1).astype(np.int64).sum() * nt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--brick", type=int, default=0,
                    help="march brick edge (accel.set_brick); 0 = default")
    ap.add_argument("--substeps", type=int, default=0,
                    help="accel.BRICK_SUBSTEPS override; 0 = default")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.brick or args.substeps:
        from raymarchcl_tpu.ops import accel as accel_ns

        if args.brick:
            accel_ns.set_brick(args.brick)
        if args.substeps:
            accel_ns.BRICK_SUBSTEPS = args.substeps

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.render import _maxfilt2d, auto_tiles
    from raymarchcl_tpu.ops.sampling import make_mc_tables, transpose_table
    from raymarchcl_tpu.options import render_options

    volume_np, vres = default_volume((args.vres,) * 3)
    vol = jnp.asarray(volume_np, jnp.uint8)
    opts = render_options(
        width=args.size, height=args.size, vres=list(vres), iter=2,
        mat=args.mat, eyepos=compute_eyepos(135.0, 2.25, 0.35),
        targetpos=[0, -0.4, 0],
    )
    accel = build_accel_for(volume_np, opts)
    tables = make_mc_tables(2, seed=0)
    n = opts.num_pixels
    tiles = auto_tiles(n)
    while tiles > 1 and (n % tiles != 0 or n // tiles < 512):
        tiles //= 2
    ids = jnp.arange(n, dtype=jnp.int32)
    accum0 = jnp.zeros((n, 3), jnp.float32)
    zero = {"a": jnp.zeros((n,), jnp.int32), "b": jnp.zeros((n,), jnp.int32)}

    # device arrays as jit ARGS, not closure captures (CLAUDE.md
    # dispatch-poison gotcha)
    @jax.jit
    def two_pass(vol, opts, tables, accel, accum0, ids, zero):
        # _render_pass_deferred takes the TRANSPOSED (4, T) table
        _, maps1 = render_mod._render_pass_deferred(
            vol, opts, transpose_table(tables[0]), accum0, ids, accel, tiles,
            prev_cost=zero
        )
        _, maps2 = render_mod._render_pass_deferred(
            vol, opts, transpose_table(tables[1]), accum0, ids, accel, tiles,
            prev_cost=maps1
        )
        return maps1, maps2

    maps1, maps2 = jax.device_get(
        two_pass(vol, opts, tables, accel, accum0, ids, zero)
    )
    w = args.size

    # phase A: exact reproduction of pass 2's band order
    filt_a = np.asarray(_maxfilt2d(jnp.asarray(maps1["a"]), w, 3))
    order_a = np.argsort(filt_a, kind="stable")
    useful_a = int(maps2["a"].astype(np.int64).sum())
    paid_a = band_paid(maps2["a"][order_a], tiles)

    # phase B: morton-tiebreak-free approximation (see module doc)
    filt_b = np.asarray(_maxfilt2d(jnp.asarray(maps1["b"]), w, 5))[order_a]
    key_b = np.clip(filt_b, 0, 4095).astype(np.int64)
    order_b = np.argsort(key_b, kind="stable")
    useful_b = int(maps2["b"].astype(np.int64).sum())
    paid_b = band_paid(maps2["b"][order_a][order_b], tiles)

    # recorded per-pass phase times at the headline config (PERFORMANCE.md
    # round-3 stage budget, 16-pass frame): march ~= (no-lights - fixed)/16,
    # shade ~= (full - no-lights)/16
    t_march_ms = 1200.0 / 16.0
    t_shade_ms = 6040.0 / 16.0
    out = {
        "config": f"{args.size}^2/{args.mat}/vres{args.vres}",
        "tiles": tiles,
        "march": {
            "useful": useful_a,
            "paid": paid_a,
            "overhead": round(paid_a / max(useful_a, 1), 3),
            "ns_per_paid_app_at_recorded_time": round(
                t_march_ms * 1e6 / max(paid_a, 1), 1
            ),
        },
        "shade": {
            "useful": useful_b,
            "paid_approx": paid_b,
            "overhead": round(paid_b / max(useful_b, 1), 3),
            "ns_per_paid_app_at_recorded_time": round(
                t_shade_ms * 1e6 / max(paid_b, 1), 1
            ),
        },
        "gather_floor_ns": 18,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
