"""Width-scaling probe for the while-body cost model.

The recorded model (PERFORMANCE.md round-3 cost-model section) says:
  - while-body cost ~ op count x ~0.2 us ISSUE cost at any operand width
    <= (N, 128) -- the TRAILING axis is free real estate;
  - the TILE_RAYS sweep implies the LEADING axis scales ~linearly past
    4096 (doubling lanes/band leaves FRAME time flat, so per-app cost
    ~doubles);
  - row gathers are strictly linear in row count (bench_gather_ilp).

If all three hold at production-like shapes, stacking S INDEPENDENT
work units (e.g. spp passes of the same pixel band) on the trailing axis
multiplies while-body throughput ~ (ops + g)/(ops/S + g): per-lane-app
cost (100us ops + S x 10us gather)/(S*4096) drops ~3.2x at S=4. This
script measures that directly with a production-shaped banded while_loop
(gather -> dependent elementwise chain), NOT a serial scan microbench
(those measure dispatch latency; see CLAUDE.md) -- the loop here runs a
FIXED round count with real data dependence through the carry, the same
structure as the flat march, so per-round cost is comparable across
shapes.

Variants (R rounds, B bands via outer scan, fetch-timed):
  lead-N:  state (N,),   1 row gather of N indices / round
  trail-W: state (N, W), 1 row gather of N*W indices / round (flattened),
           ops on (N, W*ROWW) flattened 2-D operands only
Reports us/round and us/round/Klane.

Usage: python scripts/bench_width_scaling.py [--rounds 64] [--bands 8]
       [--depth 60] [--table 8192]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

ROWW = 18  # words per gathered row, as the brick table


def build(n, w, rounds, depth, table_rows):
    """Banded while_loop: per round ONE flattened row gather (n*w rows)
    + a depth-`depth` dependent elementwise chain on (n, w*ROWW)."""

    def band(carry, _):
        st, acc = carry  # st: (n, w) f32 driver state

        def body(k_st_acc):
            k, st, acc = k_st_acc
            idx = (st.astype(jnp.int32) & (table_rows - 1)).reshape(-1)  # (n*w,)
            rows = acc_table[idx]  # (n*w, ROWW) f32
            x = rows.reshape(n, w * ROWW)
            # dependent elementwise chain, mimics the masked block sequence
            for i in range(depth):
                x = x * 1.0000001 + jnp.float32(i)
            red = x.reshape(n, w, ROWW).sum(-1)  # (n, w) fold per work unit
            st = st + red * 1e-6 + 1.0
            return k + 1, st, acc + red.sum() * 1e-9

        k, st, acc = jax.lax.while_loop(
            lambda c: c[0] < rounds, body, (jnp.int32(0), st, acc)
        )
        return (st, acc), acc

    acc_table = None  # bound below

    def run(table, st0):
        nonlocal acc_table
        acc_table = table
        (st, acc), _ = jax.lax.scan(band, (st0, jnp.float32(0.0)), None, length=BANDS)
        return acc

    return run


BANDS = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=64)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--depth", type=int, default=60)
    ap.add_argument("--table", type=int, default=8192)
    args = ap.parse_args()
    global BANDS
    BANDS = args.bands

    print(f"device: {jax.devices()[0]}", flush=True)
    table = jnp.asarray(
        np.random.RandomState(0).rand(args.table, ROWW).astype(np.float32)
    )

    def timeit(n, w):
        run = jax.jit(build(n, w, args.rounds, args.depth, args.table))
        st0 = jnp.asarray(np.random.RandomState(1).rand(n, w).astype(np.float32))
        float(run(table, st0))  # compile
        best = 1e9
        for rep in range(3):
            s = st0 + np.float32(1e-5 * (rep + 1))
            t0 = time.perf_counter()
            float(run(table, s))
            best = min(best, time.perf_counter() - t0)
        tot_rounds = args.rounds * args.bands
        us = best / tot_rounds * 1e6
        print(
            f"  N={n:6d} W={w:3d}  {us:8.1f} us/round  "
            f"{us / (n * w / 1024):8.2f} us/round/Klane",
            flush=True,
        )
        return us

    print(f"rounds={args.rounds} bands={args.bands} depth={args.depth} "
          f"table={args.table}")
    print("leading-axis scaling (W=1):")
    for n in (1024, 2048, 4096, 8192, 16384):
        timeit(n, 1)
    print("trailing-axis scaling (N=4096):")
    for w in (1, 2, 4, 8, 16):
        timeit(4096, w)
    print("trailing at N=2048 (constant 16k lanes cross-check):")
    timeit(2048, 8)

    # Narrow-op variant: the REAL while body is ~500 narrow ops on (N,)
    # carries (audit_body_ops: 623 eqns post-wide) plus ONE row gather —
    # issue-bound, not compute-bound. Stacked carries become (N, W); this
    # measures that regime directly (chain on (N, W) f32, no 18-wide rows).
    def timeit_narrow(n, w, depth):
        def build_run():
            def band(carry, _):
                st, acc = carry  # (n, w)

                def body(c):
                    k, st, acc = c
                    idx = (st.astype(jnp.int32) & (args.table - 1)).reshape(-1)
                    g = acc_tab[idx, 0].reshape(n, w)  # per-lane element
                    x = st
                    for i in range(depth):
                        x = x * 1.0000001 + jnp.float32(i & 7) * 1e-7
                    st = x + g * 1e-6
                    return k + 1, st, acc + st.sum() * 1e-12

                k, st, acc = jax.lax.while_loop(
                    lambda c: c[0] < args.rounds, body, (jnp.int32(0), st, acc)
                )
                return (st, acc), acc

            acc_tab = None

            def run(tab, st0):
                nonlocal acc_tab
                acc_tab = tab
                (st, acc), _ = jax.lax.scan(
                    band, (st0, jnp.float32(0.0)), None, length=args.bands
                )
                return acc

            return run

        run = jax.jit(build_run())
        st0 = jnp.asarray(np.random.RandomState(1).rand(n, w).astype(np.float32))
        float(run(table, st0))
        best = 1e9
        for rep in range(3):
            s = st0 + np.float32(1e-5 * (rep + 1))
            t0 = time.perf_counter()
            float(run(table, s))
            best = min(best, time.perf_counter() - t0)
        us = best / (args.rounds * args.bands) * 1e6
        print(
            f"  N={n:6d} W={w:3d} depth={depth:4d}  {us:8.1f} us/round  "
            f"{us / (n * w / 1024):8.2f} us/round/Klane",
            flush=True,
        )

    print("narrow-op (issue-bound) trailing scaling, depth=400, N=4096:")
    for w in (1, 2, 4, 8):
        timeit_narrow(4096, w, 400)
    print("narrow-op leading control, W=1:")
    for n in (8192, 16384):
        timeit_narrow(n, 1, 400)

    # 3-D operand check: a stacked engine wants carries (N, P) and word
    # blocks (N, P, W) — the round-3 wide-matrix showed (N, S, 128) is
    # catastrophic at W=128; is (N, P, 16/18) tolerable, or must every
    # block be hand-flattened to (N, P*W)?
    def timeit_3d(n, p, w, depth, flatten):
        def build_run():
            def band(carry, _):
                st, acc = carry  # (n, p)

                def body(c):
                    k, st, acc = c
                    idx = (st.astype(jnp.int32) & (args.table - 1)).reshape(-1)
                    rows = acc_tab[idx]  # (n*p, ROWW)
                    x = (rows[:, :w].reshape(n, p * w) if flatten
                         else rows[:, :w].reshape(n, p, w))
                    for i in range(depth):
                        x = x * 1.0000001 + jnp.float32(i & 7) * 1e-7
                    red = (x.reshape(n, p, w).sum(-1) if flatten
                           else x.sum(-1))  # (n, p)
                    st = st + red * 1e-6 + 1.0
                    return k + 1, st, acc + red.sum() * 1e-12

                k, st, acc = jax.lax.while_loop(
                    lambda c: c[0] < args.rounds, body, (jnp.int32(0), st, acc)
                )
                return (st, acc), acc

            acc_tab = None

            def run(tab, st0):
                nonlocal acc_tab
                acc_tab = tab
                (st, acc), _ = jax.lax.scan(
                    band, (st0, jnp.float32(0.0)), None, length=args.bands
                )
                return acc

            return run

        run = jax.jit(build_run())
        st0 = jnp.asarray(np.random.RandomState(1).rand(n, p).astype(np.float32))
        float(run(table, st0))
        best = 1e9
        for rep in range(3):
            s = st0 + np.float32(1e-5 * (rep + 1))
            t0 = time.perf_counter()
            float(run(table, s))
            best = min(best, time.perf_counter() - t0)
        us = best / (args.rounds * args.bands) * 1e6
        tag = "flat (N, P*W)" if flatten else "3-D (N, P, W)"
        print(f"  N={n:6d} P={p:2d} W={w:3d} {tag}  {us:8.1f} us/round",
              flush=True)

    print("3-D vs flattened word blocks (depth=60 on the block):")
    for p in (2, 4):
        timeit_3d(4096, p, 16, 60, flatten=False)
        timeit_3d(4096, p, 16, 60, flatten=True)

    # Batch-LEADING (P, N) — the layout jax.vmap produces (batch axis 0 on
    # every intermediate). Measured near-linear (v5e: (4,4096) = 2.2x the
    # (4096,4) cost), which is why the vmap-based render.PASS_STACK
    # prototype ran 11% SLOWER: the trailing-axis win requires carries to
    # be literally (N, P) — a manual engine refactor, not a vmap.
    def timeit_narrow_lead(p, n, depth):
        def build_run():
            def band(carry, _):
                st, acc = carry  # (p, n)

                def body(c):
                    k, st, acc = c
                    idx = (st.astype(jnp.int32) & (args.table - 1)).reshape(-1)
                    g = acc_tab[idx, 0].reshape(p, n)
                    x = st
                    for i in range(depth):
                        x = x * 1.0000001 + jnp.float32(i & 7) * 1e-7
                    st = x + g * 1e-6
                    return k + 1, st, acc + st.sum() * 1e-12

                k, st, acc = jax.lax.while_loop(
                    lambda c: c[0] < args.rounds, body, (jnp.int32(0), st, acc)
                )
                return (st, acc), acc

            acc_tab = None

            def run(tab, st0):
                nonlocal acc_tab
                acc_tab = tab
                (st, acc), _ = jax.lax.scan(
                    band, (st0, jnp.float32(0.0)), None, length=args.bands
                )
                return acc

            return run

        run = jax.jit(build_run())
        st0 = jnp.asarray(np.random.RandomState(1).rand(p, n).astype(np.float32))
        float(run(table, st0))
        best = 1e9
        for rep in range(3):
            s = st0 + np.float32(1e-5 * (rep + 1))
            t0 = time.perf_counter()
            float(run(table, s))
            best = min(best, time.perf_counter() - t0)
        us = best / (args.rounds * args.bands) * 1e6
        print(f"  ({p}, {n}) batch-leading  {us:8.1f} us/round  "
              f"{us / (p * n / 1024):8.2f} us/round/Klane", flush=True)

    print("batch-LEADING (P, N) narrow-op control (the vmap layout):")
    for p in (2, 4, 8):
        timeit_narrow_lead(p, 4096, 400)


if __name__ == "__main__":
    main()
