"""Integration smoke tests: the 5 BASELINE.json benchmark configs at reduced
resolution (SURVEY.md §4 'Integration tests = the 5 BASELINE.json configs').

Each config renders end-to-end (with the accel structure, as production
does) and asserts structural sanity: finite accumulation, non-trivial image
content, alpha channel set.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raymarchcl_tpu import api
from raymarchcl_tpu.models import generators, mesh
from raymarchcl_tpu.ops.camera import compute_eyepos
from raymarchcl_tpu.ops.sampling import make_mc_tables
from raymarchcl_tpu.options import render_options
from raymarchcl_tpu.parallel import tiling

BUDGETS = dict(maxIter=32, maxVoxelIter=64, shadowIter=32)  # reduced-res budgets


def _check(argb):
    argb = np.asarray(argb)
    assert (argb >> 24 == 0xFF).all()  # alpha
    rgb = argb & 0x00FFFFFF
    assert np.unique(rgb).size > 16  # actual image content
    return argb


@pytest.fixture(scope="module")
def gyro():
    return generators.make_gyroid_volume({"vres": [48, 48, 96]}), (48, 48, 96)


def test_config1_primary_flat(gyro):
    """Config 1: gyroid, 224x224 -> 56x56, 1 spp, primary-dominant (ao)."""
    vol, vres = gyro
    argb, _ = api.render_frame(
        vol, vres, iter=1, width=56, height=56, mat="ao",
        eyepos=compute_eyepos(135, 2.25, 0.35), targetpos=[0, -0.4, 0], **BUDGETS,
    )
    _check(argb)


def test_config2_ao_fog_supersampled(gyro):
    """Config 2: gyroid 512^2 -> 48^2 with AO + fog, 25 -> 5 spp jittered."""
    vol, vres = gyro
    argb, accum = api.render_frame(
        vol, vres, iter=5, width=48, height=48, mat="ao", fogPow=0.1,
        eyepos=compute_eyepos(135, 2.25, 0.35), targetpos=[0, -0.4, 0], **BUDGETS,
    )
    _check(argb)
    assert np.isfinite(np.asarray(accum)).all()


def test_config3_bunny_smooth_normals():
    """Config 3: voxelized mesh on a 64^3 grid, smoothed normals, 16->4 spp."""
    # stand-in bunny: voxelized icosphere vertices (no STL assets in-repo)
    th = np.linspace(0.2, np.pi - 0.2, 16)
    ph = np.linspace(0, 2 * np.pi, 32)
    T, P = np.meshgrid(th, ph)
    pts = np.stack(
        [np.sin(T) * np.cos(P), np.cos(T), np.sin(T) * np.sin(P)], -1
    ).reshape(-1, 3).astype(np.float32)
    vol = mesh.voxelize_ks(pts, 64, 1)
    argb, _ = api.render_frame(
        vol, (64, 64, 64), iter=4, width=48, height=48, mat="ao",
        eyepos=compute_eyepos(120, 2.0, 0.5), targetpos=[0, 0, 0], **BUDGETS,
    )
    _check(argb)


def test_config4_metal_reflections(gyro):
    """Config 4: metal/reflective materials, reflection bounces, 16->2 spp."""
    vol, vres = gyro
    argb, _ = api.render_frame(
        vol, vres, iter=2, width=40, height=40, mat="metal",
        eyepos=compute_eyepos(135, 2.25, 0.35), targetpos=[0, -0.4, 0], **BUDGETS,
    )
    _check(argb)


def test_config5_dof_tiled_multichip(gyro):
    """Config 5: DOF 0.025 + metal + many spp, tiled across the mesh —
    tiled result must equal single-device."""
    vol, vres = gyro
    opts = render_options(
        width=40, height=32, vres=list(vres), iter=3, mat="metal", dof=0.025,
        eyepos=compute_eyepos(135, 2.25, 0.35), targetpos=[0, -0.4, 0], **BUDGETS,
    )
    tables = make_mc_tables(3, seed=0)
    volj = jnp.asarray(vol)
    from raymarchcl_tpu.ops import render as render_mod

    argb_1, _ = render_mod.render_image(volj, opts, tables)
    argb_t, _ = tiling.render_image_tiled(volj, opts, tables, mesh=tiling.make_mesh())
    np.testing.assert_array_equal(argb_t, argb_1)
    _check(argb_t)
