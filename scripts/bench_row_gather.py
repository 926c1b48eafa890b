"""XLA row-gather rate: can `jnp.take(table, idx, axis=0)` fetch brick ROWS
faster than the ~100 M elem/s scalar-gather wall fetches elements?

If yes, a brick-march becomes viable in pure XLA: stage (K, W) u32 brick
rows per band (one row = a bit-packed voxel brick), then probe bits with
vector ops instead of per-probe scalar gathers.

Measures rows/s and effective bits/s for row widths W in {8,16,32,128,256}
u32 words, random indices, table ~2-8 MiB. Also re-measures the 1-elem
baseline. Honest timing per CLAUDE.md (perturbed inputs, fetch-timed).

Run: python scripts/bench_row_gather.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

K = 4096  # rows gathered per probe round
REPS = 256  # rounds inside one program


def timeit(fn, *args, perturb, n=3):
    np.asarray(fn(*args))
    best = 1e9
    for r in range(1, n + 1):
        a = perturb(args, r)
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_width(w, nrows=16384):
    table = jnp.arange(nrows * w, dtype=jnp.uint32).reshape(nrows, w)

    @jax.jit
    def f(idx):
        def body(c, i):
            rows = jnp.take(table, (idx + i) % nrows, axis=0)  # (K, w)
            return c ^ rows, None
        out, _ = jax.lax.scan(
            body, jnp.zeros((K, w), jnp.uint32), jnp.arange(REPS, dtype=jnp.int32))
        return out

    idx = jnp.asarray(np.random.randint(0, nrows, K), jnp.int32)
    dt = timeit(f, idx, perturb=lambda a, r: ((a[0] + r) % nrows,))
    rows_s = K * REPS / dt
    print(f"  W={w:4d} u32 ({w*4:5d} B/row, table {nrows*w*4>>20} MiB): "
          f"{rows_s/1e6:8.2f} M rows/s  {rows_s*w*32/1e9:9.1f} G bit/s  "
          f"{rows_s*w/1e6:9.0f} M elem/s", flush=True)


def bench_elem():
    n = 16384 * 128
    table = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def f(idx):
        def body(c, i):
            return c ^ jnp.take(table, (idx + i) % n), None
        out, _ = jax.lax.scan(
            body, jnp.zeros((K,), jnp.uint32), jnp.arange(REPS, dtype=jnp.int32))
        return out

    idx = jnp.asarray(np.random.randint(0, n, K), jnp.int32)
    dt = timeit(f, idx, perturb=lambda a, r: ((a[0] + r) % n,))
    print(f"  1-elem baseline: {K*REPS/dt/1e6:8.2f} M elem/s", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  K={K} REPS={REPS}", flush=True)
    bench_elem()
    for w in (8, 16, 32, 64, 128, 256):
        bench_width(w)
    # wide-table variant: 512^3-scale brick table (32768 rows of 128 words)
    bench_width(128, nrows=32768)


def bench_batch_sizes():
    """elem- and 16-word-row-gather rate vs batch size K (fixed tables)."""
    n = 16384 * 128
    table1 = jnp.arange(n, dtype=jnp.uint32)
    nrows = 32768  # 8^3 bricks of a 256^3 volume
    table16 = jnp.arange(nrows * 16, dtype=jnp.uint32).reshape(nrows, 16)
    for k in (1024, 4096, 16384, 65536):
        reps = max(8, (1 << 22) // k)

        @jax.jit
        def fe(idx):
            def body(c, i):
                return c ^ jnp.take(table1, (idx + i) % n), None
            return jax.lax.scan(body, jnp.zeros((k,), jnp.uint32),
                                jnp.arange(reps, dtype=jnp.int32))[0]

        @jax.jit
        def fr(idx):
            def body(c, i):
                return c ^ jnp.take(table16, (idx + i) % nrows, axis=0), None
            return jax.lax.scan(body, jnp.zeros((k, 16), jnp.uint32),
                                jnp.arange(reps, dtype=jnp.int32))[0]

        idx1 = jnp.asarray(np.random.randint(0, n, k), jnp.int32)
        idxr = jnp.asarray(np.random.randint(0, nrows, k), jnp.int32)
        dte = timeit(fe, idx1, perturb=lambda a, r: ((a[0] + r) % n,))
        dtr = timeit(fr, idxr, perturb=lambda a, r: ((a[0] + r) % nrows,))
        print(f"  K={k:6d}: elem {k*reps/dte/1e6:8.2f} M/s   "
              f"16w-row {k*reps/dtr/1e6:8.2f} M rows/s", flush=True)
