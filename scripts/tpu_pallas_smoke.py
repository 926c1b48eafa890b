"""Hardware smoke test for the Pallas kernels (run on a real TPU).

Validates Mosaic lowering + numerics of tonemap_pack_pallas vs the XLA
pack_argb. (march_volume_pallas is interpret-only: Mosaic has no arbitrary
gather — see its docstring; pass --try-march to watch it fail.)

Usage:  python scripts/tpu_pallas_smoke.py [--try-march]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from raymarchcl_tpu.models import generators
from raymarchcl_tpu.ops import march, render as render_mod
from raymarchcl_tpu.ops.kernels.march_pallas import march_volume_pallas
from raymarchcl_tpu.ops.kernels.tonemap_pallas import tonemap_pack_pallas
from raymarchcl_tpu.ops.vecmath import V3
from raymarchcl_tpu.options import render_options


def timed(name, fn, *args, reps=3):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(f(*args))
    print(f"  {name}: {(time.perf_counter() - t0) / reps * 1e3:.2f} ms")
    return out


def main():
    try_march = "--try-march" in sys.argv
    print("device:", jax.devices()[0])

    print("tonemap/pack:")
    rng = np.random.default_rng(0)
    accum = jnp.asarray(rng.uniform(0, 30, (1 << 20, 3)).astype(np.float32))
    opts = render_options(width=1024, height=1024, vres=8, iter=1)
    want = timed("xla ", lambda a: render_mod.pack_argb(opts, a), accum)
    got = timed("pallas", lambda a: tonemap_pack_pallas(a, 1.5), accum)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    print("  MATCH")

    if not try_march:
        return
    print("vmem march (128^3 volume, 256k rays, 192 steps):")
    vol = jnp.asarray(generators.make_gyroid_volume({"vres": [128] * 3}))
    o = render_options(width=512, height=512, vres=128, iter=1)
    n = 512 * 512
    r = np.random.default_rng(1)
    rp = r.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    rd = r.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    pv = V3.from_array(jnp.asarray(rp))
    dv = V3.from_array(jnp.asarray(rd))
    idist = march.intersects_box((-0.99,) * 3, (0.99,) * 3, pv, dv)
    adv = jnp.where(idist > 0, idist, 0.0)
    p0 = V3((pv.x + 1 + dv.x * adv) * 0.5, (pv.y + 1 + dv.y * adv) * 0.5,
            (pv.z + 1 + dv.z * adv) * 0.5)
    delta = dv * (1.0 / 96.0 * 0.5)
    mask = jnp.asarray(idist >= 0)
    hx, kx = timed(
        "xla ", lambda *a: march.march_volume(vol, o, p0, delta, 192, mask)
    )
    hp, kp = timed(
        "pallas", lambda *a: march_volume_pallas(vol, o, p0, delta, 192, mask)
    )
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hx))
    hxn = np.asarray(hx)
    np.testing.assert_array_equal(np.asarray(kp)[hxn], np.asarray(kx)[hxn])
    print("  MATCH")


if __name__ == "__main__":
    main()
