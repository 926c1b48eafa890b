"""Mesh/voxelizer tests: STL round-trip, grid fit, voxelizer semantics
(reference: meshvoxel.clj)."""

import struct

import numpy as np
import pytest

from raymarchcl_tpu.models import mesh


def write_binary_stl(path, tris):
    """tris: (T, 3, 3) float vertices."""
    tris = np.asarray(tris, np.float32)
    with open(path, "wb") as f:
        f.write(b"\x00" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(np.zeros(3, np.float32).tobytes())  # normal
            f.write(t.astype("<f4").tobytes())
            f.write(struct.pack("<H", 0))


@pytest.fixture
def tetra(tmp_path):
    tris = [
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        [[0, 0, 0], [1, 0, 0], [0, 0, 1]],
        [[0, 0, 0], [0, 1, 0], [0, 0, 1]],
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
    ]
    p = tmp_path / "tetra.stl"
    write_binary_stl(p, tris)
    return p


def test_binary_stl_unique_vertices(tetra):
    v = mesh.read_stl(tetra)
    assert v.shape == (4, 3)  # 4 unique vertices out of 12 stored


def test_ascii_stl(tmp_path):
    p = tmp_path / "t.stl"
    p.write_text(
        "solid t\n facet normal 0 0 1\n  outer loop\n"
        "   vertex 0 0 0\n   vertex 1.5 0 0\n   vertex 0 2 0\n"
        "  endloop\n endfacet\nendsolid t\n"
    )
    v = mesh.read_stl(p)
    assert v.shape == (3, 3)
    assert [1.5, 0, 0] in v.tolist()


def test_mesh_scale_fits_largest_extent():
    verts = np.array([[0, 0, 0], [2, 1, 0.5]], np.float32)
    fn = mesh.mesh_scale(verts, 64)
    lo = fn(verts[0])
    hi = fn(verts[1])
    # largest extent (x) maps to [0, 64); others centered
    np.testing.assert_allclose(hi[0] - lo[0], 64.0)
    np.testing.assert_allclose((lo + hi) / 2, [32, 32, 32], atol=1e-5)


def test_voxelize_point_stamp(tetra):
    v = mesh.read_stl(tetra)
    vox = mesh.voxelize(v, 16)
    assert vox.sum() > 0
    assert set(np.unique(vox)) <= {0, 255}
    # corner vertex (0,0,0) maps in-bounds and is stamped z-major
    fn = mesh.mesh_scale(v, 16)
    q = fn([0, 0, 0]).astype(int)
    assert vox[q[2] * 256 + q[1] * 16 + q[0]] == 255


def test_voxelize_ks_dilates(tetra):
    v = mesh.read_stl(tetra)
    v0 = mesh.voxelize(v, 32)
    v1 = mesh.voxelize_ks(v, 32, 1)
    assert (v1 > 0).sum() > (v0 > 0).sum()
    # every point-stamp voxel is inside the dilated set
    assert np.all(v1[v0 > 0] == 255)


def test_voxelize_scatter_seeded(tetra):
    v = mesh.read_stl(tetra)
    a = mesh.voxelize_scatter(v, 32, seed=7)
    b = mesh.voxelize_scatter(v, 32, seed=7)
    np.testing.assert_array_equal(a, b)
    assert set(np.unique(a)) <= {0, 64}
    assert (a > 0).sum() > 0


def test_heatmap_columns():
    gray = np.zeros((8, 8), np.uint8)
    gray[2, 3] = 100  # h = max(2, 100*amp)
    gray[5, 6] = 255  # c > 224 -> h = 2
    vox = mesh.make_heatmap(gray, amp=0.05, res=8).reshape(8, 8, 8)
    # y-major: vox[y, hh, x]
    assert vox[2, 0, 3] == 255 and vox[2, 4, 3] == 255 and vox[2, 5, 3] == 0  # h=5
    assert vox[5, 0, 6] == 255 and vox[5, 1, 6] == 255 and vox[5, 2, 6] == 0  # h=2
    assert vox.sum() == (5 + 2) * 255


def test_committed_asset_voxelize_render():
    """The committed kilovertex organic asset (assets/trefoil.stl,
    scripts/make_mesh_asset.py) through the full STL -> voxelize -> render
    path — the reference's flagship workflow (meshvoxel.clj:25-69,
    README.org:49-56)."""
    import os

    import jax.numpy as jnp

    from raymarchcl_tpu.api import build_accel_for
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    stl = os.path.join(os.path.dirname(__file__), "..", "assets", "trefoil.stl")
    v = mesh.read_stl(stl)
    assert v.shape[0] >= 10_000  # kilovertex-scale, per the round-1 review
    vol_np = mesh.voxelize_ks(v, 64, 1)
    occ = (vol_np > 0).mean()
    assert 0.01 < occ < 0.5, f"implausible occupancy {occ}"
    opts = render_options(
        width=48, height=32, vres=64, iter=1, mat="metal",
        maxIter=32, maxVoxelIter=64, shadowIter=32,
        eyepos=compute_eyepos(120.0, 2.0, 0.5), targetpos=[0, 0, 0],
    )
    acc = build_accel_for(vol_np, opts)
    tables = make_mc_tables(1, seed=2)
    argb, _ = render_mod.render_image(jnp.asarray(vol_np), opts, tables, accel=acc)
    # the knot must actually be visible: some non-sky, non-ground pixels hit
    # voxels (material slots 1-3 shade differently from the sky gradient)
    a = np.asarray(argb)
    assert a.shape == (32, 48)
    assert len(np.unique(a)) > 64, "render is implausibly flat"
