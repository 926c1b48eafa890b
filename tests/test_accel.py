"""Empty-space-skip accel tests: the accelerated march must be BIT-EQUAL to
the plain march — skipping is only allowed where provably inconsequential."""

import jax.numpy as jnp
import numpy as np
import pytest

from raymarchcl_tpu.models import generators
from raymarchcl_tpu.ops import accel as accel_mod
from raymarchcl_tpu.ops import march, render as render_mod
from raymarchcl_tpu.ops.camera import compute_eyepos
from raymarchcl_tpu.ops.sampling import make_mc_tables
from raymarchcl_tpu.ops.vecmath import V3
from raymarchcl_tpu.options import render_options


@pytest.fixture(scope="module", params=[4, 5])
def scene(request):
    vol_np = generators.make_gyroid_volume({"vres": [32, 32, 96]})
    opts = render_options(
        width=32, height=24, vres=[32, 32, 96], iter=2, mat="metal",
        maxIter=32, maxVoxelIter=64, shadowIter=32,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    acc = accel_mod.build_accel(vol_np, opts.voxelRes, opts.isoVal,
                                block_log2=request.param)
    return jnp.asarray(vol_np), opts, acc


def test_build_accel_marks_boundary_occupied(scene):
    _, opts, acc = scene
    bxn, byn, bzn = acc.dims
    mip = np.asarray(acc.mip).reshape(bzn, byn, bxn)
    assert mip[0].all() and mip[-1].all()
    assert mip[:, 0].all() and mip[:, -1].all()
    assert mip[:, :, 0].all() and mip[:, :, -1].all()


def test_raymarch_bit_equal(scene):
    vol, opts, acc = scene
    rng = np.random.default_rng(5)
    n = 256
    rp = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    pv = V3.from_array(jnp.asarray(rp))
    dv = V3.from_array(jnp.asarray(rd))
    act = jnp.ones((n,), bool)
    a = march.raymarch(vol, opts, pv, dv, opts.maxDist, opts.maxIter, False, act)
    b = march.raymarch(
        vol, opts, pv, dv, opts.maxDist, opts.maxIter, False, act, accel=acc
    )
    np.testing.assert_array_equal(np.asarray(a["distance"]), np.asarray(b["distance"]))
    np.testing.assert_array_equal(np.asarray(a["object_id"]), np.asarray(b["object_id"]))
    np.testing.assert_array_equal(
        np.asarray(a["normal"].to_array()), np.asarray(b["normal"].to_array())
    )


def test_full_render_bit_equal(scene):
    vol, opts, acc = scene
    tables = make_mc_tables(2, seed=4)
    argb_plain, accum_plain = render_mod.render_image(vol, opts, tables)
    argb_acc, accum_acc = render_mod.render_image(vol, opts, tables, accel=acc)
    np.testing.assert_array_equal(argb_acc, argb_plain)
    np.testing.assert_array_equal(np.asarray(accum_acc), np.asarray(accum_plain))


def test_terrain_render_bit_equal():
    vol_np = generators.make_terrain({"vres": [64, 64, 64]})
    opts = render_options(
        width=32, height=24, vres=64, iter=1, mat="ao",
        maxIter=24, maxVoxelIter=48, shadowIter=24,
        eyepos=compute_eyepos(45.0, 2.5, 0.8), targetpos=[0, 0, 0],
    )
    acc = accel_mod.build_accel(vol_np, opts.voxelRes, opts.isoVal, block_log2=4)
    vol = jnp.asarray(vol_np)
    tables = make_mc_tables(1, seed=1)
    a, _ = render_mod.render_image(vol, opts, tables)
    b, _ = render_mod.render_image(vol, opts, tables, accel=acc)
    np.testing.assert_array_equal(a, b)


def test_empty_volume_all_skippable():
    vol_np = np.zeros(32**3, np.uint8)
    opts = render_options(width=8, height=8, vres=32, iter=1, maxVoxelIter=64)
    acc = accel_mod.build_accel(vol_np, opts.voxelRes, opts.isoVal, block_log2=3)
    mip = np.asarray(acc.mip).reshape(4, 4, 4)
    assert mip[1:-1, 1:-1, 1:-1].sum() == 0  # interior empty
    vol = jnp.asarray(vol_np)
    tables = make_mc_tables(1, seed=0)
    a, _ = render_mod.render_image(vol, opts, tables)
    b, _ = render_mod.render_image(vol, opts, tables, accel=acc)
    np.testing.assert_array_equal(a, b)
