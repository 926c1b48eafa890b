"""Mosaic primitive experiments for a Pallas brick-march kernel (round 2).

The XLA wall: arbitrary 1-D gathers run ~90-110 M elem/s (scalar-loop
emitter; PERFORMANCE.md). A brick-march kernel would replace per-probe
gathers with (a) per-ray VMEM row fetches staging a 16^3 bit-brick per ray,
then (b) pure vector-register probes against the staged rows. This script
measures whether the primitives that design needs actually compile and how
fast they run on v5e:

  E1  row-fetch loop: out[k, :] = table[s_k, :] for k in range(K), scalar
      dynamic index from SMEM (the staging step)
  E2  sublane dynamic gather: take_along_axis(table, idx, axis=0) with
      per-lane indices, depths 8..4096 (the "2D gather" Mosaic supports?)
  E3  in-brick probe: (K,128) mask + bit test + lane-reduce, U probes/round
  E4  transpose (K,128)->(128,K) inside the kernel
  E5  lax.while_loop inside a kernel (the march loop shape)
  E0  XLA jnp.take baseline at the same element count

Timing: the hosted runtime caches identical calls and block_until_ready is
unreliable -> every rep perturbs inputs and fetches results (CLAUDE.md).
Run on the real chip: python scripts/bench_pallas_prims.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 1024  # rays per band
S = 4096  # brick rows in table (256^3 / 16^3)
REPS_IN = 64  # kernel-internal repetitions to amortize call overhead


def timeit(fn, *args, perturb, n=3):
    np.asarray(fn(*args))  # compile
    best = 1e9
    for r in range(1, n + 1):
        a = perturb(args, r)
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, dt, elems):
    print(f"  {name:34s} {dt*1e6:9.1f} us  {elems/dt/1e6:10.1f} M/s", flush=True)


def e0_xla_take():
    table = jnp.arange(S * 128, dtype=jnp.uint32)

    @jax.jit
    def f(idx):
        def body(c, i):
            return c + jnp.take(table, (idx + i) % (S * 128)), None
        out, _ = jax.lax.scan(body, jnp.zeros((K,), jnp.uint32),
                              jnp.arange(REPS_IN, dtype=jnp.int32))
        return out

    idx = jnp.asarray(np.random.randint(0, S * 128, K), jnp.int32)
    dt = timeit(f, idx, perturb=lambda a, r: ((a[0] + r) % (S * 128),))
    report("E0 xla take (1 elem/probe)", dt, K * REPS_IN)


def e1_row_fetch():
    def kernel(sidx_ref, table_ref, out_ref):
        def rep(j, _):
            def body(k, _):
                s = (sidx_ref[k] + j) % S
                out_ref[pl.ds(k, 1), :] = table_ref[pl.ds(s, 1), :]
                return 0
            return jax.lax.fori_loop(0, K, body, 0)
        jax.lax.fori_loop(0, REPS_IN, rep, 0)

    @jax.jit
    def f(sidx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K, 128), jnp.uint32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )(sidx, table)

    table = jnp.arange(S * 128, dtype=jnp.uint32).reshape(S, 128)
    sidx = jnp.asarray(np.random.randint(0, S, K), jnp.int32)
    try:
        out = np.asarray(f(sidx, table))
        exp = np.asarray(table)[(np.asarray(sidx) + REPS_IN - 1) % S]
        assert (out == exp).all(), "row fetch wrong values"
        dt = timeit(f, sidx, table, perturb=lambda a, r: ((a[0] + r) % S, a[1]))
        report("E1 row fetch loop (rows/s)", dt, K * REPS_IN)
        report("   as bits staged (bit/s)", dt, K * REPS_IN * 4096)
    except Exception as ex:
        print(f"  E1 FAILED: {type(ex).__name__}: {str(ex)[:300]}")


def e2_sublane_gather(depth):
    def kernel(table_ref, idx_ref, out_ref):
        def rep(j, acc):
            ix = (idx_ref[:] + j) % depth
            g = jnp.take_along_axis(table_ref[:], ix, axis=0)
            return acc + g
        out_ref[:] = jax.lax.fori_loop(
            0, REPS_IN, rep, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def f(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    table = jnp.arange(depth * 128, dtype=jnp.int32).reshape(depth, 128)
    idx = jnp.asarray(np.random.randint(0, depth, (8, 128)), jnp.int32)
    try:
        np.asarray(f(table, idx))
        dt = timeit(f, table, idx, perturb=lambda a, r: (a[0], (a[1] + r) % depth))
        report(f"E2 sublane gather depth={depth:4d}", dt, 8 * 128 * REPS_IN)
    except Exception as ex:
        print(f"  E2 depth={depth} FAILED: {type(ex).__name__}: {str(ex)[:200]}")


def e3_probe(u=8):
    """U in-brick probes per round against a staged (K,128) rows buffer."""
    def kernel(rows_ref, w_ref, b_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)

        def rep(j, acc):
            hits = acc
            for i in range(u):
                w = (w_ref[:] + j + i) % 128  # (K, 1) word index per ray
                bit = (b_ref[:] + i) % 32
                mask = lanes == w
                sel = jnp.where(mask, rows_ref[:], jnp.uint32(0))
                word = jnp.max(sel, axis=1, keepdims=True)  # (K, 1)
                hits = hits + ((word >> bit.astype(jnp.uint32)) & 1).astype(jnp.int32)
            return hits
        out_ref[:] = jax.lax.fori_loop(
            0, REPS_IN // u, rep, jnp.zeros((K, 1), jnp.int32))

    @jax.jit
    def f(rows, w, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(rows, w, b)

    rows = jnp.asarray(np.random.randint(0, 2**32, (K, 128), dtype=np.uint64).astype(np.uint32))
    w = jnp.asarray(np.random.randint(0, 128, (K, 1)), jnp.int32)
    b = jnp.asarray(np.random.randint(0, 32, (K, 1)), jnp.int32)
    try:
        np.asarray(f(rows, w, b))
        dt = timeit(f, rows, w, b, perturb=lambda a, r: (a[0], (a[1] + r) % 128, a[2]))
        report(f"E3 in-brick probe (mask+reduce)", dt, K * (REPS_IN // u) * u)
    except Exception as ex:
        print(f"  E3 FAILED: {type(ex).__name__}: {str(ex)[:300]}")


def e4_transpose():
    def kernel(x_ref, out_ref):
        def rep(j, acc):
            return acc + x_ref[:].T
        out_ref[:] = jax.lax.fori_loop(
            0, REPS_IN, rep, jnp.zeros((128, K), jnp.int32))

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, K), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.arange(K * 128, dtype=jnp.int32).reshape(K, 128)
    try:
        np.asarray(f(x))
        dt = timeit(f, x, perturb=lambda a, r: (a[0] + r,))
        report("E4 transpose (K,128)->(128,K)", dt, K * 128 * REPS_IN)
    except Exception as ex:
        print(f"  E4 FAILED: {type(ex).__name__}: {str(ex)[:300]}")


def e5_while():
    def kernel(x_ref, out_ref):
        def cond(c):
            return jnp.max(c[1][:, :1]) > 0

        def body(c):
            i, v = c
            return i + 1, v - 1
        i, v = jax.lax.while_loop(cond, body, (jnp.int32(0), x_ref[:]))
        out_ref[:] = v + i

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.full((8, 128), 5, jnp.int32)
    try:
        out = np.asarray(f(x))
        print(f"  E5 while_loop in kernel: OK (out[0,0]={out[0,0]})")
    except Exception as ex:
        print(f"  E5 FAILED: {type(ex).__name__}: {str(ex)[:300]}")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    e0_xla_take()
    e1_row_fetch()
    for depth in (8, 32, 128, 512, 4096):
        e2_sublane_gather(depth)
    e3_probe()
    e4_transpose()
    e5_while()
