"""Native C++ data-pipeline tests: the OpenMP paths must agree with the
pure numpy/jnp reference paths bit-for-bit (modulo float-boundary voxels for
the transcendental-heavy gyroid)."""

import os

import numpy as np
import pytest

from raymarchcl_tpu.native import binding

pytestmark = pytest.mark.skipif(
    not binding.available(), reason="native lib not built (no toolchain?)"
)


def _pure(monkeypatch_module, fn, *args, **kw):
    """Run a generator with the native path disabled."""
    import raymarchcl_tpu.models.generators as g
    import raymarchcl_tpu.models.mesh as m

    old_g, old_m = g._native, m._native
    g._native = m._native = None
    try:
        return fn(*args, **kw)
    finally:
        g._native, m._native = old_g, old_m


def test_gyroid_native_vs_jnp():
    from raymarchcl_tpu.models import generators

    a = binding.gyroid_volume(16, 16, 48, 0.01 * 512 / 16)
    b = _pure(None, generators.make_gyroid_volume, {"vres": [16, 16, 48]})
    # float32 (jnp) vs float64 (C) can flip exact-threshold voxels
    assert np.mean(a != b) < 0.002


def test_terrain_native_vs_numpy():
    from raymarchcl_tpu.models import generators

    a = binding.terrain_volume(40, 40, 40)
    b = _pure(None, generators.make_terrain, {"vres": [40, 40, 40]})
    np.testing.assert_array_equal(a, b)


def test_terrain_non_cubic_native_vs_numpy():
    """Non-cubic grids: wall-2 slab clamping must agree (and not overflow
    when rx > rz)."""
    from raymarchcl_tpu.models import generators

    for vres in ([48, 24, 16], [16, 24, 48]):
        a = binding.terrain_volume(*vres)
        b = _pure(None, generators.make_terrain, {"vres": vres})
        np.testing.assert_array_equal(a, b)


def test_gyroid_fallback_matches_native_exactly():
    """The numpy float64 fallback and the C++ double path must agree
    bit-for-bit (determinism across machines)."""
    from raymarchcl_tpu.models import generators

    a = binding.gyroid_volume(24, 24, 48, 0.01 * 512 / 24)
    b = _pure(None, generators.make_gyroid_volume, {"vres": [24, 24, 48]})
    np.testing.assert_array_equal(a, b)


def test_voxelizers_native_vs_numpy():
    from raymarchcl_tpu.models import mesh

    rng = np.random.default_rng(3)
    verts = rng.uniform(-1, 2, (500, 3)).astype(np.float32)
    a = mesh.voxelize(verts, 32)
    b = _pure(None, mesh.voxelize, verts, 32)
    np.testing.assert_array_equal(a, b)
    a = mesh.voxelize_ks(verts, 32, 2)
    b = _pure(None, mesh.voxelize_ks, verts, 32, 2)
    np.testing.assert_array_equal(a, b)


def test_voxelize_scatter_native_vs_numpy():
    """The scatter voxelizer's counter-based splitmix64 stream
    (mesh._scatter_draws / rmcl_voxelize_scatter) must make the two paths
    byte-identical — including the trunc-toward-zero coordinate casts."""
    from raymarchcl_tpu.models import mesh

    rng = np.random.default_rng(11)
    verts = rng.uniform(-1, 2, (700, 3)).astype(np.float32)
    for seed in (0, 3, 2**63 + 5):
        a = mesh.voxelize_scatter(verts, 32, seed=seed)
        b = _pure(None, mesh.voxelize_scatter, verts, 32, seed=seed)
        np.testing.assert_array_equal(a, b)
        assert set(np.unique(a)) <= {0, 64} and (a > 0).any()


def test_vox_io_native_roundtrip(tmp_path):
    vox = np.random.default_rng(0).integers(0, 256, 3 * 4 * 5, dtype=np.uint8)
    p = str(tmp_path / "n.vox")
    binding.save_volume(p, 3, 4, 5, vox)
    out, res = binding.load_volume(p)
    assert res == (3, 4, 5)
    np.testing.assert_array_equal(out, vox)
    # cross-check with the python reader
    import raymarchcl_tpu.io.voxio as vio

    with open(p, "rb") as f:
        raw = f.read()
    assert raw[:5] == b"VOXEL"


def test_native_is_fast_for_512():
    import time

    t0 = time.perf_counter()
    vox = binding.gyroid_volume(256, 256, 256, 0.02)
    dt = time.perf_counter() - t0
    assert vox.size == 256**3
    assert dt < 10.0  # reference took minutes at 512^3 single-threaded
