"""Offline study: fixing the stacked engine's GROUP-0 cold-start.

The round-5 stacked audit (scripts/audit_apps_stacked.py) split paid shade
apps per group: group 0 (no cost history — its band sort is Morton-only)
pays 140.1M vs group 1's 88.2M at the headline spec, while the perfect
per-pixel-key row-granularity oracle is 120.5M TOTAL. Group 0's missing
history is the single biggest realizable scheduling lever left
(~50M paid apps ~= 0.4 s at the measured 8.4 ns/paid-app effective rate).

This script replays the production stacked schedule offline (same
decaying-max carry, 3x3/5x5 max filters, morton tiebreak, any-hit split —
render.py _render_pass_deferred_stacked) from maps cached by
`audit_apps_stacked.py --save-maps`, and evaluates realizable group-0
history sources:

* prepass{64,128,256}: seed the carry with pass-0's true app maps
  max-pooled to a low-res grid and nearest-upsampled — the offline proxy
  for a cheap low-resolution instrumented prepass (a real prepass sees
  different jitters; the production 5x5 filter absorbs that class of
  noise, so pooled truth is the right optimistic model).
* prepass_full: full-res pass-0 truth as the seed (prepass ceiling).
* pilot heads: split the 16 passes [1,7,8] / [2,7,7] — render a short
  unstacked/small-stack HEAD first and use its TRUE maps as history
  (realizable exactly: the engine already supports head+tail stacking).
* p4: groups of 4 (more history, less amortization) for reference.

Usage: python scripts/study_group0_key.py --maps /tmp/audit_maps_512.npz
Reference workload: renderer.cl:478-494 at core.clj:28-74 defaults.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def maxfilt(m, w, k):
    """k x k max filter over the row-major (n//w, w) grid (edge-clamped) —
    numpy mirror of render._maxfilt2d."""
    n = m.shape[0]
    a = m.reshape(n // w, w)
    r = k // 2
    pad = np.pad(a, ((r, r), (r, r)), mode="edge")
    out = a.copy()
    for dy in range(k):
        for dx in range(k):
            np.maximum(out, pad[dy:dy + a.shape[0], dx:dx + a.shape[1]],
                       out=out)
    return out.reshape(-1)


def band_paid(apps_band_order, bands):
    a = np.asarray(apps_band_order, np.int64)
    nl = a.shape[0] // bands
    return int(a.reshape(bands, nl).max(axis=1).sum() * nl)


def morton10(x, y, z):
    def spread(v):
        v = v.astype(np.int64)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def morton_of(pos):
    q = np.clip((pos + 2.0) * (1023.0 / 4.0), 0.0, 1023.0).astype(np.int32)
    return morton10(q[:, 0], q[:, 1], q[:, 2])


def pool_up(m, w, f):
    """f x f max-pool then nearest-upsample — the low-res prepass proxy."""
    if f <= 1:
        return m.copy()
    h = m.shape[0] // w
    a = m.reshape(h // f, f, w // f, f).max(axis=(1, 3))
    return np.repeat(np.repeat(a, f, axis=0), f, axis=1).reshape(-1)


def sample_up(m, w, f):
    """Every-f-th point sample then nearest-upsample — what a real subset
    prepass measures (noisier than pooling: one jittered sample per cell)."""
    if f <= 1:
        return m.copy()
    h = m.shape[0] // w
    a = m.reshape(h, w)[::f, ::f]
    return np.repeat(np.repeat(a, f, axis=0), f, axis=1).reshape(-1)


def replay(groups, apps_a, apps_b, hits, mortons, w, rows_s, tiles_u,
           init=None, head_unstacked_tiles=None):
    """Replay the production stacked schedule over `groups` = [(start, P)].

    rows_s: stacked band rows (band = rows_s * P lanes). P=1 groups band at
    tiles_u bands (the production unstacked tiling). Returns paid a/b plus
    per-group paid b. init: optional {'a','b'} initial cost maps."""
    n = apps_a.shape[1]
    cost = {"a": np.zeros(n, np.int64), "b": np.zeros(n, np.int64)}
    if init is not None:
        cost = {k: init[k].astype(np.int64).copy() for k in ("a", "b")}
    paid = {"a": 0, "b": 0}
    paid_b_groups = []
    for start, p in groups:
        sl = slice(start, start + p)
        if p == 1 and head_unstacked_tiles:
            bands_a = bands_b = head_unstacked_tiles
        else:
            bands_a = bands_b = n // rows_s
        order_a = np.argsort(maxfilt(cost["a"], w, 3), kind="stable")
        lane_a = apps_a[sl][:, order_a]  # (P, n)
        paid["a"] += band_paid(lane_a.T.reshape(-1), bands_a)
        hit_any = hits[sl].any(axis=0)[order_a]
        morton = mortons[start][order_a]
        cost_b = maxfilt(cost["b"], w, 5)[order_a]
        key = np.where(
            hit_any,
            (np.clip(cost_b, 0, 4095).astype(np.int64) << 14)
            | (morton.astype(np.int64) >> 16),
            np.int64(2**40) + np.arange(n, dtype=np.int64),
        )
        perm = np.argsort(key, kind="stable")
        lane_b = apps_b[sl][:, order_a]
        pg = band_paid(lane_b[:, perm].T.reshape(-1), bands_b)
        paid["b"] += pg
        paid_b_groups.append(pg)
        new_a = np.zeros(n, np.int64)
        new_a[order_a] = lane_a.max(axis=0)
        new_b = np.zeros(n, np.int64)
        new_b[order_a[perm]] = lane_b[:, perm].max(axis=0)
        cost = {k: np.maximum(new, old - (old >> 2))
                for k, new, old in
                [("a", new_a, cost["a"]), ("b", new_b, cost["b"])]}
    return paid["a"], paid["b"], paid_b_groups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maps", default="/tmp/audit_maps_512.npz")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--rows", type=int, default=1024,
                    help="STACK_TILE_ROWS (stacked band rows)")
    ap.add_argument("--tiles-u", type=int, default=64,
                    help="production unstacked tiles at this size")
    args = ap.parse_args()
    w = args.size
    z = np.load(args.maps)
    apps_a = z["apps_a"].astype(np.int64)
    apps_b = z["apps_b"].astype(np.int64)
    hits = z["hits"]
    spp, n = apps_a.shape
    ipos0 = {int(k[5:]): z[k] for k in z.files if k.startswith("ipos0")}
    # group-entry morton; groups starting off a saved snapshot reuse the
    # nearest earlier one (pass hit positions correlate ~0.89 — proxy only)
    mort = {}
    snaps = sorted(ipos0)
    for s in range(spp):
        src = max(k for k in snaps if k <= s)
        mort[s] = morton_of(ipos0[src])
    useful_a = int(apps_a.sum())
    useful_b = int(apps_b.sum())

    out = {"config": f"{w}^2/{spp}spp", "useful": {"a": useful_a,
                                                   "b": useful_b},
           "variants": {}}

    def run(name, groups, init=None):
        pa, pb, pbg = replay(groups, apps_a, apps_b, hits, mort, w,
                             args.rows, args.tiles_u, init=init,
                             head_unstacked_tiles=args.tiles_u)
        out["variants"][name] = {
            "paid_a": pa, "paid_b": pb,
            "ov_a": round(pa / useful_a, 3), "ov_b": round(pb / useful_b, 3),
            "paid_b_groups": pbg,
        }

    g88 = [(0, 8), (8, 8)]
    run("baseline_8_8", g88)
    for f, nm in ((1, "prepass_full"), (2, "prepass256"), (4, "prepass128"),
                  (8, "prepass64")):
        init = {"a": pool_up(apps_a[0], w, f), "b": pool_up(apps_b[0], w, f)}
        run(nm, g88, init=init)
    # realistic prepass proxies: POINT-sampled (not pooled), and sourced
    # from a DIFFERENT pass's map (models jitter decorrelation: the real
    # prepass draws its own jitters, correlating with pass 0 only as much
    # as any other pass does)
    for f in (2, 4, 8):
        run(f"sample{w//f}", g88,
            init={"a": sample_up(apps_a[0], w, f),
                  "b": sample_up(apps_b[0], w, f)})
        run(f"sample{w//f}_xpass", g88,
            init={"a": sample_up(apps_a[1], w, f),
                  "b": sample_up(apps_b[1], w, f)})
    # conservative recovery: max-filter the SAMPLED coarse grid before
    # upsampling (a point sample misses the cell's worst pixel — sample128
    # measured WORSE than no history; width-k filtering at coarse res
    # trades resolution for coverage)
    def sample_filt_up(m, f, k, src=0):
        h = w  # square frames here
        a = (apps_a if m == "a" else apps_b)[src].reshape(h, w)[::f, ::f]
        a = maxfilt(a.reshape(-1), w // f, k)
        a = a.reshape(h // f, w // f)
        return np.repeat(np.repeat(a, f, axis=0), f, axis=1).reshape(-1)

    for f in (2, 4):
        for k in (3, 5):
            run(f"sample{w//f}_filt{k}", g88,
                init={"a": sample_filt_up("a", f, k, src=1),
                      "b": sample_filt_up("b", f, k, src=1)})
    run("pilot_1_7_8", [(0, 1), (1, 7), (8, 8)])
    run("pilot_2_7_7", [(0, 2), (2, 7), (9, 7)])
    run("pilot_1_7_8_prepassed", [(0, 1), (1, 7), (8, 8)],
        init={"a": pool_up(apps_a[0], w, 4), "b": pool_up(apps_b[0], w, 4)})
    run("p4", [(0, 4), (4, 4), (8, 4), (12, 4)])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
