"""Pallas kernel tests (interpreter mode on CPU; Mosaic lowering is
validated on hardware by scripts/tpu_pallas_smoke.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raymarchcl_tpu.models import generators
from raymarchcl_tpu.ops import march, render as render_mod
from raymarchcl_tpu.ops.kernels.march_pallas import march_volume_pallas
from raymarchcl_tpu.ops.kernels.tonemap_pallas import tonemap_pack_pallas
from raymarchcl_tpu.ops.vecmath import V3
from raymarchcl_tpu.options import render_options


def test_tonemap_pack_matches_xla():
    rng = np.random.default_rng(0)
    accum = jnp.asarray(rng.uniform(-0.5, 30, (1000, 3)).astype(np.float32))
    opts = render_options(width=10, height=100, vres=8, iter=1, gamma=1.5)
    want = np.asarray(render_mod.pack_argb(opts, accum))
    got = np.asarray(tonemap_pack_pallas(accum, 1.5, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_march_pallas_matches_xla():
    vol_np = generators.make_gyroid_volume({"vres": [32, 32, 96]})
    opts = render_options(width=8, height=8, vres=[32, 32, 96], iter=1)
    vol = jnp.asarray(vol_np)
    rng = np.random.default_rng(2)
    n = 500
    rp = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    steps = 64
    # build p0/delta exactly as distance_to_scene does
    pv = V3.from_array(jnp.asarray(rp))
    dv = V3.from_array(jnp.asarray(rd))
    idist = march.intersects_box((-0.99,) * 3, (0.99,) * 3, pv, dv)
    adv = jnp.where(idist > 0, idist, 0.0)
    p0 = V3(
        (pv.x + 1 + dv.x * adv) * 0.5,
        (pv.y + 1 + dv.y * adv) * 0.5,
        (pv.z + 1 + dv.z * adv) * 0.5,
    )
    delta = dv * (1.0 / (steps * 0.5) * 0.5)
    mask = jnp.asarray(idist >= 0)
    hit_x, k_x = march.march_volume(vol, opts, p0, delta, steps, mask)
    hit_p, k_p = march_volume_pallas(vol, opts, p0, delta, steps, mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(hit_p), np.asarray(hit_x))
    np.testing.assert_array_equal(
        np.asarray(k_p)[np.asarray(hit_x)], np.asarray(k_x)[np.asarray(hit_x)]
    )
