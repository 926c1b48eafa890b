"""Microbench: do INDEPENDENT row gathers in one while-round overlap?

The brick-cache A/B (scripts/bench_brick_cache.py, PERFORMANCE.md round-3)
showed frame time scaling with the number of SERIAL resolve blocks per
application, pinning the engine on per-round latency (~112 us/app at 4096
lanes ~= the known 100-130 us serial-step floor), not gather throughput.
If a round can issue G address-independent row gathers for the latency of
one, a speculative next-brick prefetch (the geometric brick exit is
row-independent) could retire ~2 bricks per round at unchanged latency.

Method: fori_loop whose carry holds G index vectors; each round gathers G
(N, W) rows from a brick-sized table and folds them into the carry with
cheap ops; the next round's indices depend on the PREVIOUS round's fold
(serial chain, like the real march) but the G gathers within a round are
mutually independent. Per CLAUDE.md: inputs perturbed per rep, timed by
fetching, no-gather control subtracted.

Usage: python scripts/bench_gather_ilp.py [--n 4096] [--rows 32768]
       [--width 18] [--depth 64] [--g 1,2,4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def make_fn(g, depth, nrows):
    @jax.jit
    def f(table, idx0):
        # idx0: (G, N) int32
        def body(i, carry):
            idx, acc = carry
            folds = []
            for j in range(g):
                rows = jnp.take(table, idx[j], axis=0, mode="clip")  # (N, W)
                folds.append(rows.sum(axis=1).astype(jnp.int32))  # cheap fold
            mix = acc
            for fo in folds:
                mix = mix ^ fo
            # next round's G addresses all derive from the SAME fold result
            # (serial round chain), but are mutually independent
            new_idx = jnp.stack(
                [(mix * (1103515245 + 2 * j) + 12345 + i) % nrows for j in range(g)]
            )
            return new_idx, mix
        _, acc = jax.lax.fori_loop(0, depth, body, (idx0, jnp.zeros_like(idx0[0])))
        return acc.sum()
    return f


def make_control(g, depth, nrows):
    @jax.jit
    def f(table, idx0):
        def body(i, carry):
            idx, acc = carry
            mix = acc
            for j in range(g):
                mix = mix ^ idx[j]
            new_idx = jnp.stack(
                [(mix * (1103515245 + 2 * j) + 12345 + i) % nrows for j in range(g)]
            )
            return new_idx, mix
        _, acc = jax.lax.fori_loop(0, depth, body, (idx0, jnp.zeros_like(idx0[0])))
        return acc.sum()
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--rows", type=int, default=32768)
    ap.add_argument("--width", type=int, default=18)
    ap.add_argument("--depth", type=int, default=64)
    ap.add_argument("--g", default="1,2,4")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 2**31, (args.rows, args.width), dtype=np.int64).astype(np.int32)
    )

    def run(f, idx0):
        return float(np.asarray(f(table, idx0)))

    for g in [int(x) for x in args.g.split(",") if x]:
        f = make_fn(g, args.depth, args.rows)
        ctl = make_control(g, args.depth, args.rows)
        idx0 = jnp.asarray(
            rng.integers(0, args.rows, (g, args.n), dtype=np.int64).astype(np.int32)
        )
        run(f, idx0); run(ctl, idx0)  # compile
        best, bestc = 1e9, 1e9
        for rep in range(args.reps):
            idx = jnp.asarray(
                rng.integers(0, args.rows, (g, args.n), dtype=np.int64).astype(np.int32)
            )
            t0 = time.perf_counter(); run(f, idx)
            best = min(best, time.perf_counter() - t0)
            t0 = time.perf_counter(); run(ctl, idx)
            bestc = min(bestc, time.perf_counter() - t0)
        per_round = (best - bestc) / args.depth * 1e6
        print(
            f"G={g}: total {best*1e3:.1f} ms (control {bestc*1e3:.1f}) -> "
            f"{per_round:.1f} us/round gather cost, "
            f"{per_round/g:.1f} us/gather", flush=True,
        )


if __name__ == "__main__":
    main()
