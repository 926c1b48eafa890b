"""Microbench: gather-op cost vs gather size on the real TPU.

Question for the round-2 march redesign: XLA lowers arbitrary gathers to a
scalar loop at ~100 M elem/s (PERFORMANCE.md). Is there a fixed per-OP
overhead that punishes many small sequential gathers (the distance-driven
march does 1 small gather per probe step) relative to few big ones (the
chunked march gathers (16, N) per round)?

Method per CLAUDE.md: perturb inputs per rep (identical calls are served
from a cache), time by fetching the result to host, subtract the fetch RTT
via a no-gather control.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

DEPTH = 32  # sequential dependent gathers per program (models march rounds)


def make_fn(n):
    @jax.jit
    def f(table, idx0):
        def body(i, carry):
            idx, acc = carry
            v = jnp.take(table, idx, mode="clip").astype(jnp.int32)
            acc = acc + v
            idx = (idx * 1103515245 + 12345 + i) % table.shape[0]
            return idx, acc

        idx, acc = jax.lax.fori_loop(0, DEPTH, body, (idx0, jnp.zeros(n, jnp.int32)))
        return acc.sum()

    return f


@jax.jit
def control(table, idx0):
    # same loop structure, no gather
    def body(i, carry):
        idx, acc = carry
        acc = acc + idx
        idx = (idx * 1103515245 + 12345 + i) % table.shape[0]
        return idx, acc

    idx, acc = jax.lax.fori_loop(0, DEPTH, body, (idx0, jnp.zeros_like(idx0)))
    return acc.sum()


def timeit(f, table, n, reps=5):
    best = 1e9
    for r in range(reps):
        idx0 = jnp.asarray(np.random.randint(0, table.shape[0], n, dtype=np.int32))
        t0 = time.perf_counter()
        v = np.asarray(f(table, idx0))
        dt = time.perf_counter() - t0
        if r > 0:  # skip compile rep
            best = min(best, dt)
    return best


def main():
    table = jnp.asarray(np.random.randint(0, 255, 1 << 24, dtype=np.uint8))
    print(f"backend: {jax.devices()[0]}")
    print(f"{'N':>8} {'total_ms':>9} {'ctrl_ms':>8} {'gather_us/op':>12} {'ns/elem':>8}")
    for n in [128, 256, 512, 1024, 2048, 4096, 8192, 16384, 65536, 262144]:
        f = make_fn(n)
        t = timeit(f, table, n)
        tc = timeit(control, table, n)
        per_op = (t - tc) / DEPTH * 1e6
        per_el = (t - tc) / (DEPTH * n) * 1e9
        print(f"{n:>8} {t*1e3:>9.2f} {tc*1e3:>8.2f} {per_op:>12.1f} {per_el:>8.1f}")


if __name__ == "__main__":
    main()
