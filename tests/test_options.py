"""Option/config system parity tests (reference: core.clj:28-74,
materials.clj)."""

import math

import numpy as np
import pytest

from raymarchcl_tpu.materials import PRESETS, get_preset
from raymarchcl_tpu.options import MC_TABLE_LENGTH, render_options


def test_defaults_match_reference():
    o = render_options(width=640, height=360, vres=256, iter=1, t=0.0)
    # core.clj:34-73 defaults
    assert float(o.aoStepDist) == pytest.approx(0.05)
    assert o.aoIter == 5
    assert float(o.dof) == pytest.approx(0.001)
    assert float(o.eps) == pytest.approx(0.005)
    assert float(o.exposure) == pytest.approx(3.5)
    assert float(o.flareAmp) == pytest.approx(0.015)
    assert float(o.fogPow) == pytest.approx(0.05)
    assert float(o.fov) == pytest.approx(math.radians(90))
    assert float(o.frameBlend) == pytest.approx(1.0)
    assert float(o.gamma) == pytest.approx(1.5)
    assert float(o.groundY) == pytest.approx(1.05)
    assert float(o.invAspect) == pytest.approx(360 / 640)
    np.testing.assert_allclose(np.asarray(o.invVoxelScale), [0.5, 0.5, 0.5])
    assert o.isoVal == 32
    assert float(o.lightScatter) == pytest.approx(0.2)
    assert float(o.maxDist) == 30
    assert o.maxIter == 128
    assert o.maxVoxelIter == 192
    assert float(o.minLightAtt) == 0.0
    assert o.shadowIter == 128
    assert float(o.shadowBias) == pytest.approx(0.1)
    np.testing.assert_allclose(np.asarray(o.skyColor1), [1.8, 1.8, 1.9])
    np.testing.assert_allclose(np.asarray(o.skyColor2), [0.1, 0.1, 0.1])
    assert float(o.startDist) == 0.0
    np.testing.assert_allclose(np.asarray(o.targetPos), [0, -0.15, 0])
    np.testing.assert_allclose(np.asarray(o.up), [0, 1, 0])
    np.testing.assert_allclose(np.asarray(o.voxelBoundsMax), [0.99] * 3)
    np.testing.assert_allclose(np.asarray(o.voxelBoundsMin), [-0.99] * 3)
    assert o.voxelRes == (256, 256, 256, 256 * 256)
    assert float(o.voxelSize) == pytest.approx(1 / 256)
    assert o.mcTableLength == MC_TABLE_LENGTH == 0x4000
    np.testing.assert_allclose(np.asarray(o.eyePos), [2, 0, 2])


def test_derived_fields():
    o = render_options(width=800, height=200, vres=[64, 128, 32], iter=4, fov=60)
    assert float(o.frameBlend) == pytest.approx(0.25)
    assert float(o.invAspect) == pytest.approx(0.25)
    assert float(o.fov) == pytest.approx(math.radians(60))
    assert o.voxelRes == (64, 128, 32, 64 * 128)
    assert float(o.voxelSize) == pytest.approx(1 / 64)  # 1/rx (core.clj:73)
    assert o.resolution == (800, 200)


def test_preset_merge_unknown_falls_back_to_ao():
    o = render_options(iter=1, mat="nope")
    assert o.numLights == 1  # ao preset
    assert o.reflectIter == 0
    np.testing.assert_allclose(np.asarray(o.lightColor)[0], [50, 50, 50, 0])
    # lightPos stays at the defaults map's value (ao preset has none)
    np.testing.assert_allclose(np.asarray(o.lightPos)[0], [-2, 0, -2, 0])
    np.testing.assert_allclose(np.asarray(o.mat_r0), [0, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(o.mat_smoothness), [1, 1, 1, 1])


def test_metal_preset():
    o = render_options(iter=1, mat="metal")
    assert o.numLights == 2
    assert o.reflectIter == 3
    assert float(o.aoAmp) == pytest.approx(0.25)
    np.testing.assert_allclose(np.asarray(o.lightPos)[0], [0, 2, 0, 0])
    np.testing.assert_allclose(np.asarray(o.lightPos)[1], [3, 0, 3, 0])
    np.testing.assert_allclose(np.asarray(o.lightColor)[1], [16, 36, 56, 0])
    np.testing.assert_allclose(np.asarray(o.mat_albedo)[2, :3], [0.25, 0.27, 0.5])
    np.testing.assert_allclose(np.asarray(o.mat_r0), [0.1, 0.1, 0.7, 0.2])


def test_all_presets_have_4_materials():
    for name in ("orange-stripes", "metal", "metal2", "ao"):
        p = PRESETS[name]
        assert len(p["materials"]) == 4
        assert get_preset(":" + name) is PRESETS[name]


def test_opts_is_jit_stable_pytree():
    import jax

    o1 = render_options(iter=2, mat="metal", t=0.0)
    o2 = render_options(iter=2, mat="metal", t=0.333)
    t1 = jax.tree_util.tree_structure(o1)
    t2 = jax.tree_util.tree_structure(o2)
    assert t1 == t2  # time change must not retrace
    o3 = render_options(iter=2, mat="ao")
    assert jax.tree_util.tree_structure(o3) != t1  # numLights is static


def test_overrides_extension():
    o = render_options(iter=1, mat="ao", maxIter=16, exposure=1.25)
    assert o.maxIter == 16
    assert float(o.exposure) == pytest.approx(1.25)
