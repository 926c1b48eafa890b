"""Pallas kernel tests (interpreter mode on CPU; Mosaic lowering is
validated on hardware by scripts/tpu_pallas_smoke.py).

The round-1 VMEM march kernel was deleted: Mosaic exposes no arbitrary
gather (dynamic_gather is 2-D, sublane depth 8 only) and scalar-loop row
staging in-kernel runs at 0.7 M rows/s vs XLA's 30-57 M rows/s take()
(measured on v5e — scripts/bench_pallas_prims.py). The brick-table march
(ops/accel.py) supersedes it in pure XLA. The tonemap/pack kernel IS the
production pack path on TPU (ops/render.pack_argb)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raymarchcl_tpu.ops import render as render_mod
from raymarchcl_tpu.ops.kernels.tonemap_pallas import tonemap_pack_pallas
from raymarchcl_tpu.options import render_options


def test_tonemap_pack_matches_xla():
    rng = np.random.default_rng(0)
    accum = jnp.asarray(rng.uniform(-0.5, 30, (1000, 3)).astype(np.float32))
    opts = render_options(width=10, height=100, vres=8, iter=1, gamma=1.5)
    col = render_mod.tonemap(accum, opts.gamma) * 255.0
    col = jnp.clip(col, 0.0, 255.0).astype(jnp.uint32)
    want = np.asarray(
        jnp.uint32(0xFF000000) | (col[:, 0] << 16) | (col[:, 1] << 8) | col[:, 2]
    )
    got = np.asarray(tonemap_pack_pallas(accum, 1.5, interpret=True))
    np.testing.assert_array_equal(got, want)
