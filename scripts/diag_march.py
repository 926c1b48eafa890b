"""March-cost diagnostic battery for the TPU. Run in a FRESH process.

Every jitted function takes ALL device values as arguments (no closures —
captured device arrays poison the process, see memory notes). Values are
fetched to host; a sanity op is interleaved to detect degraded mode.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N = 65536
CH = 16
RES = 256
RXY = RES * RES
SIZE3 = RES**3


def t(name, f, *a, reps=3):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name}: {dt * 1e3:8.2f} ms", flush=True)
    return r


@jax.jit
def sanity(x):
    return (x + 1).sum()


def make_loop_fn(K, body_kind):
    @jax.jit
    def f(vol, p0x, p0y, p0z, dx, dy, dz, ks):
        def cond(c):
            return c[0] < K

        def body(c):
            i, acc = c
            base = i.astype(jnp.float32) * CH
            if body_kind == "coords":
                x = p0x[None, :] + dx[None, :] * (ks + base)
                y = p0y[None, :] + dy[None, :] * (ks + base)
                z = p0z[None, :] + dz[None, :] * (ks + base)
                return (i + 1, acc + (x + y + z).sum().astype(jnp.int32))
            x = p0x[None, :] + dx[None, :] * (ks + base)
            y = p0y[None, :] + dy[None, :] * (ks + base)
            z = p0z[None, :] + dz[None, :] * (ks + base)
            qx = (x * RES).astype(jnp.int32)
            qy = (y * RES).astype(jnp.int32)
            qz = (z * RES).astype(jnp.int32)
            valid = (qx >= 0) & (qx < RES) & (qy >= 0) & (qy < RES) & (qz >= 0) & (qz < RES)
            idx = jnp.where(valid, qz * RXY + qy * RES + qx, 0)
            if body_kind == "idx":
                return (i + 1, acc + idx.sum())
            v = jnp.take(vol, idx, mode="clip").astype(jnp.int32)
            v = jnp.where(valid, v, -1)
            if body_kind == "gather":
                return (i + 1, acc + v.sum())
            stop = (v < 0) | (v > 32)
            first = jnp.argmax(stop, axis=0)
            return (i + 1, acc + first.sum())

        return jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))[1]

    return f


def main():
    x2 = jnp.ones((N,))
    key = jax.random.PRNGKey(0)
    vol = jax.random.randint(key, (SIZE3,), 0, 255, dtype=jnp.int32).astype(jnp.uint8)
    p0 = jax.random.uniform(key, (3, N), minval=0.1, maxval=0.9)
    d = jax.random.normal(key, (3, N)) * (1.0 / 192.0)
    ks = jnp.arange(CH, dtype=jnp.float32)[:, None]
    args = (vol, p0[0], p0[1], p0[2], d[0], d[1], d[2], ks)

    t("sanity", sanity, x2, reps=10)
    for kind in ("coords", "idx", "gather", "full"):
        for K in (1, 12):
            t(f"{kind:7s} K={K:<3}", make_loop_fn(K, kind), *args)
        t("sanity", sanity, x2, reps=10)


if __name__ == "__main__":
    main()
