"""Procedural volume generator tests vs literal scalar re-derivations of
generators.clj."""

import math

import numpy as np

from raymarchcl_tpu.models import generators


def scalar_gyroid(s, t, p, o):
    # generators.clj:18-25
    x, y, z = (pc * s + oc for pc, oc in zip(p, o))
    return abs(
        math.cos(x) * math.sin(z) + math.cos(y) * math.sin(x) + math.cos(z) * math.sin(y)
    ) - t


def scalar_gyroid_volume(rx, ry, rz):
    # generators.clj:27-42
    vox = np.zeros(rx * ry * rz, dtype=np.uint8)
    rxy = rx * ry
    scl = 0.01 * (512 / rx)
    for z in range(rz):
        if (z & 0x3F) < 32:
            continue
        for y in range(ry):
            for x in range(rx):
                v = scalar_gyroid(scl, 1.0, (x, y, z), (0.3875, 0.0, 0.0))
                idx = z * rxy + y * rx + x
                if abs(0.2 - v) < 0.05:
                    vox[idx] = 64 if (x & 0x3F) < 32 else 128
                elif v > 0.35:
                    vox[idx] = 255
    return vox


def test_gyroid_formula():
    vals = generators.gyroid(
        0.02, 1.0, np.array([[10.0, 20.0, 30.0], [1.0, 2.0, 3.0]]), (0.3875, 0.0, 0.0)
    )
    expect = [scalar_gyroid(0.02, 1.0, p, (0.3875, 0, 0)) for p in ([10, 20, 30], [1, 2, 3])]
    np.testing.assert_allclose(np.asarray(vals), expect, rtol=1e-5)


def test_gyroid_volume_matches_scalar():
    # small but multi-slab volume spanning the z-slicing boundary
    rx = ry = 8
    rz = 72
    got = generators.make_gyroid_volume({"vres": [rx, ry, rz]}, slab=16)
    want = scalar_gyroid_volume(rx, ry, rz)
    mismatch = np.mean(got != want)
    # float32 (jnp) vs float64 (math.*) can flip values sitting exactly on a
    # band threshold; require near-exact agreement
    assert mismatch < 0.002, f"mismatch fraction {mismatch}"
    # z-slicing: bands with (z & 0x3f) < 32 are empty (generators.clj:35)
    v3 = got.reshape(rz, ry, rx)
    assert v3[:32].sum() == 0 and v3[64:].sum() == 0
    assert v3[32:64].sum() > 0
    # only legal byte values appear
    assert set(np.unique(got)) <= {0, 64, 128, 255}


def test_terrain_matches_scalar():
    rx = ry = rz = 40
    got = generators.make_terrain({"vres": [rx, ry, rz]}).reshape(rz, ry, rx)
    # scalar re-derivation (generators.clj:44-60)
    want = np.zeros((rz, ry, rx), dtype=np.uint8)
    rxy = rx * ry
    flat = want.reshape(-1)
    for z in range(4):
        for y in range(int(ry * 0.666)):
            for x in range(rx):
                flat[z * rxy + y * rx + x] = 64
                flat[x * rxy + y * rx + (rx - 1 - z)] = 64
    for z in range(rz):
        for x in range(rx):
            dx = 16 - (x % 32)
            dz = 16 - (z % 32)
            if dx * dx + dz * dz <= 121:
                y = int(ry * (0.25 + 0.125 * (math.sin(z * 0.02) * math.cos(x * 0.03))))
                for yy in range(y + 1):
                    flat[z * rxy + yy * rx + x] = 255
    np.testing.assert_array_equal(got, want)
