"""Marcher unit tests: slab test, voxel lookup, materials, normals, and the
chunked fixed-step march vs the scalar oracle (tests/scalar_ref.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import scalar_ref as S
from raymarchcl_tpu.models import generators
from raymarchcl_tpu.ops import march
from raymarchcl_tpu.ops.vecmath import V3
from raymarchcl_tpu.options import render_options


def mkopts(**kw):
    kw.setdefault("vres", 16)
    kw.setdefault("iter", 1)
    return render_options(**kw)


def v3a(a):
    return V3.from_array(jnp.asarray(a, jnp.float32))


@pytest.fixture(scope="module")
def gyro16():
    return generators.make_gyroid_volume({"vres": [16, 16, 48]})


def test_intersects_box_cases():
    bmin = (-1.0, -1.0, -1.0)
    bmax = (1.0, 1.0, 1.0)
    p = np.array(
        [
            [0.0, 0.0, -5.0],  # outside, hits
            [0.0, 0.0, 0.0],  # inside
            [0.0, 5.0, -5.0],  # misses above
            [0.0, 0.0, 5.0],  # behind (box opposite to dir)
        ],
        np.float32,
    )
    d = np.array([[0.0, 0.0, 1.0]] * 4, np.float32)
    got = np.asarray(march.intersects_box(bmin, bmax, v3a(p), v3a(d)))
    np.testing.assert_allclose(got[0], 4.0, atol=1e-6)
    np.testing.assert_allclose(got[1], 0.0, atol=1e-6)  # inside -> a = 0
    assert got[2] == -1.0
    assert got[3] == -1.0
    # cross-check vs scalar oracle on random rays
    rng = np.random.default_rng(1)
    rp = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
    rd = rng.normal(size=(64, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    got = np.asarray(march.intersects_box(bmin, bmax, v3a(rp), v3a(rd)))
    want = [
        S.intersects_box(np.array([-1, -1, -1], np.float32), np.ones(3, np.float32), p_, d_)
        for p_, d_ in zip(rp, rd)
    ]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_voxel_lookup_bounds(gyro16):
    o = mkopts(vres=[16, 16, 48])
    vol = jnp.asarray(gyro16)
    p = np.array(
        [
            [0.5, 0.5, 0.7],  # inside
            [1.5, 0.5, 0.5],  # x out of range -> -1
            [0.5, 0.5, 1.01],  # z out -> -1
            [0.999, 0.999, 0.999],  # last voxel
            [-0.03, 0.5, 0.5],  # tiny NEGATIVE: trunc-to-zero -> q=0, IN bounds (C quirk)
            [-0.7, 0.5, 0.5],  # clearly out (q=-11)
        ],
        np.float32,
    )
    got = np.asarray(march.voxel_lookup(vol, o, jnp.asarray(p)))
    sc = S.Scene(S.opts_to_dict(o), gyro16, np.zeros((0x4000, 4), np.float32))
    want = [sc.voxel_lookup(pp) for pp in p]
    np.testing.assert_array_equal(got, want)
    assert got[1] == -1 and got[2] == -1
    assert got[4] >= 0  # the truncation quirk must be preserved


def test_voxel_material_band_edges():
    v = jnp.array([0, 63, 83, 84, 167, 168, 255])
    got = np.asarray(march.voxel_material(v))
    np.testing.assert_array_equal(got, [1, 1, 1, 2, 2, 3, 3])


def test_dist_union_tiebreak():
    d, m = march.dist_union(
        jnp.array([1.0, 2.0, 2.0]), jnp.array([10.0, 20.0, 20.0]),
        jnp.array([2.0, 1.0, 2.0]), jnp.array([30.0, 40.0, 40.0]),
    )
    np.testing.assert_array_equal(np.asarray(d), [1, 1, 2])
    np.testing.assert_array_equal(np.asarray(m), [10, 40, 40])  # tie -> second


def test_normals_match_scalar(gyro16):
    o = mkopts(vres=[16, 16, 48])
    vol = jnp.asarray(gyro16)
    sc = S.Scene(S.opts_to_dict(o), gyro16, np.zeros((0x4000, 4), np.float32))
    occupied = np.argwhere(gyro16.reshape(48, 16, 16) > 32)[:40]  # (z,y,x)
    q = np.stack([occupied[:, 2], occupied[:, 1], occupied[:, 0]], axis=1).astype(np.int32)
    qv = V3.from_array(jnp.asarray(q))
    got_fast = np.asarray(march.voxel_normal_fast(vol, o, qv).to_array())
    got_smooth = np.asarray(march.voxel_normal_smooth(vol, o, qv).to_array())
    for i, qq in enumerate(q):
        want_f = S.normalize(sc.voxel_normal(qq))
        want_s = sc.voxel_normal_smooth(qq)
        np.testing.assert_allclose(got_fast[i], want_f, atol=1e-6)
        np.testing.assert_allclose(got_smooth[i], want_s, atol=1e-6)


def test_distance_to_scene_matches_scalar(gyro16):
    o = mkopts(vres=[16, 16, 48], maxVoxelIter=64)
    vol = jnp.asarray(gyro16)
    sc = S.Scene(S.opts_to_dict(o), gyro16, np.zeros((0x4000, 4), np.float32))
    rng = np.random.default_rng(7)
    rp = rng.uniform(-2, 2, (128, 3)).astype(np.float32)
    rd = rng.normal(size=(128, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    active = jnp.ones((128,), bool)
    sd = march.distance_to_scene(vol, o, v3a(rp), v3a(rd), 64, active)
    got_d = np.asarray(sd["dist"])
    got_m = np.asarray(sd["mat"])
    for i in range(128):
        isec = {}
        want = sc.distance_to_scene(isec, rp[i], rd[i], 64, False)
        np.testing.assert_allclose(got_d[i], want[0], rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(got_m[i], want[1], rtol=2e-5, atol=2e-5)


def test_raymarch_matches_scalar(gyro16):
    o = mkopts(vres=[16, 16, 48], maxIter=48, maxVoxelIter=64)
    vol = jnp.asarray(gyro16)
    sc = S.Scene(S.opts_to_dict(o), gyro16, np.zeros((0x4000, 4), np.float32))
    rng = np.random.default_rng(11)
    n = 64
    rp = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    isec = march.raymarch(
        vol, o, v3a(rp), v3a(rd), o.maxDist, o.maxIter,
        smooth=False, active=jnp.ones((n,), bool),
    )
    got_d = np.asarray(isec["distance"])
    got_id = np.asarray(isec["object_id"])
    got_n = np.asarray(isec["normal"].to_array())
    got_p = np.asarray(isec["pos"].to_array())
    n_loose = 0
    for i in range(n):
        ref = {}
        sc.raymarch(rp[i], rd[i], ref, np.float32(o.maxDist), o.maxIter, False)
        if ref["distance"] < 0:
            # degenerate below-ground runaway (distance -> -inf): float noise
            # amplifies exponentially; only require relative agreement
            np.testing.assert_allclose(got_d[i], ref["distance"], rtol=1e-3)
            continue
        if abs(got_d[i] - ref["distance"]) > 1e-3 * max(1.0, abs(ref["distance"])):
            n_loose += 1  # grazing rays may diverge at float boundaries
            continue
        assert got_id[i] == ref["objectID"], i
        np.testing.assert_allclose(got_p[i], ref["pos"], rtol=1e-4, atol=1e-4)
        if ref["objectID"] > 0:
            np.testing.assert_allclose(got_n[i], ref["normal"], atol=1e-4)
    assert n_loose <= 2, f"{n_loose} rays diverged"


def test_shadow_truncation_bit_equal(gyro16):
    """Shadow raymarch with per-ray budget truncation must give identical
    shadow factors to the untruncated march (the only consumed output is
    distance >= light_max_dist)."""
    from raymarchcl_tpu.ops.vecmath import V3 as _V3

    o = mkopts(vres=[16, 16, 48], maxIter=48, maxVoxelIter=64, shadowIter=48)
    vol = jnp.asarray(gyro16)
    rng = np.random.default_rng(21)
    n = 256
    rp = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    lmax = rng.uniform(-0.2, 5.0, n).astype(np.float32)  # incl. negative edge
    pv, dv = v3a(rp), v3a(rd)
    act = jnp.ones((n,), bool)
    a = march.raymarch(vol, o, pv, dv, jnp.asarray(lmax), o.shadowIter,
                       False, act, want_normal=False)
    b = march.raymarch(vol, o, pv, dv, jnp.asarray(lmax), o.shadowIter,
                       False, act, want_normal=False, truncate_to_max_dist=True)
    sa = np.asarray(a["distance"]) >= lmax
    sb = np.asarray(b["distance"]) >= lmax
    np.testing.assert_array_equal(sb, sa)


def test_intersects_box_boundary_parallel_edge():
    """Rays with exact-zero direction components starting exactly ON a slab
    plane: 0/0 -> NaN, resolved by NaN-suppressing fmin/fmax exactly as
    the reference's OpenCL (renderer.cl:153-161; round-1 review edge)."""
    bmin = (-1.0, -1.0, -1.0)
    bmax = (1.0, 1.0, 1.0)
    cases = []
    for px in (-1.0, 1.0):          # exactly on the x slabs
        for py in (0.0, -1.0, 2.0):  # inside / on-corner / outside
            cases.append(([px, py, -5.0], [0.0, 0.0, 1.0]))
            cases.append(([px, py, 0.0], [0.0, 1.0, 0.0]))
    cases.append(([-1.0, -1.0, -1.0], [0.0, 0.0, 1.0]))  # on an edge
    cases.append(([1.0, 1.0, 1.0], [0.0, 0.0, -1.0]))
    p = np.array([c[0] for c in cases], np.float32)
    d = np.array([c[1] for c in cases], np.float32)
    got = np.asarray(march.intersects_box(bmin, bmax, v3a(p), v3a(d)))
    for i in range(len(cases)):
        want = S.intersects_box(
            np.asarray(bmin, np.float32), np.asarray(bmax, np.float32),
            p[i], d[i],
        )
        np.testing.assert_array_equal(got[i], np.float32(want), err_msg=str(cases[i]))
