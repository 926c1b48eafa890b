"""On-hardware Pallas smoke: Mosaic-compile tonemap_pack_pallas on the real
chip and assert bit-equality with the plain-jnp pack (the same values
render.pack_argb ships on TPU).

The round-1 VMEM march kernel was deleted after measurement — Mosaic has no
arbitrary gather and in-kernel scalar row staging runs at 0.7 M rows/s vs
XLA take()'s 30-57 M rows/s (scripts/bench_pallas_prims.py); the XLA
brick-table march (ops/accel.py) supersedes it.

Usage:  python scripts/tpu_pallas_smoke.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from raymarchcl_tpu.ops import render as render_mod
from raymarchcl_tpu.ops.kernels.tonemap_pallas import tonemap_pack_pallas


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    rng = np.random.default_rng(0)
    accum = jnp.asarray(rng.uniform(-0.5, 30, (123_456, 3)).astype(np.float32))
    gamma = 1.5

    got = np.asarray(jax.jit(tonemap_pack_pallas, static_argnums=2)(accum, gamma))

    col = render_mod.tonemap(accum, gamma) * 255.0
    col = jnp.clip(col, 0.0, 255.0).astype(jnp.uint32)
    want = np.asarray(
        jnp.uint32(0xFF000000) | (col[:, 0] << 16) | (col[:, 1] << 8) | col[:, 2]
    )
    np.testing.assert_array_equal(got, want)
    print("tonemap_pack_pallas: Mosaic compile OK, bit-equal to jnp pack")


if __name__ == "__main__":
    main()
