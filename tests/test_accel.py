"""Empty-space-skip accel tests: the distance-driven march must be BIT-EQUAL
to the plain march — skipping is only allowed where provably inconsequential.

March-level outputs (hit/hit_k/object_id/normals/shadow decisions) are
compared exactly on every backend. FULL-render comparisons are exact on TPU
(asserted on hardware by scripts/tpu_invariants.py) but tolerance-based
here: the flat raymarch engine is a different loop structure from the
nested one, and XLA:CPU contracts FMAs context-dependently, moving
last-ULP positions across shading thresholds (same caveat as
tests/test_parallel.py).
"""

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


def assert_renders_match(argb_a, argb_b, accum_a=None, accum_b=None,
                         max_bad_frac=0.01):
    """Exact on TPU; CPU allows FMA-contraction drift on a small fraction of
    pixels (see module docstring)."""
    import jax

    if jax.devices()[0].platform == "tpu":
        np.testing.assert_array_equal(argb_a, argb_b)
        if accum_a is not None:
            np.testing.assert_array_equal(np.asarray(accum_a), np.asarray(accum_b))
        return
    a, b = np.asarray(argb_a), np.asarray(argb_b)
    bad = (a != b).mean()
    assert bad <= max_bad_frac, f"{bad:.2%} of pixels differ (allowed {max_bad_frac:.0%})"
    if accum_a is not None:
        np.testing.assert_allclose(
            np.asarray(accum_a), np.asarray(accum_b), rtol=2e-3, atol=2e-4
        )


@pytest.fixture(scope="module")
def scene():
    vol_np = generators.make_gyroid_volume({"vres": [32, 32, 96]})
    opts = render_options(
        width=32, height=24, vres=[32, 32, 96], iter=2, mat="metal",
        maxIter=32, maxVoxelIter=64, shadowIter=32,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    acc = accel_mod.build_accel(vol_np, opts.voxelRes, opts.isoVal)
    return jnp.asarray(vol_np), vol_np, opts, acc


def _brute_chebyshev_mask(stop_3d):
    """O(N*M) reference Chebyshev distance to {mask} U {outside}."""
    zz, yy, xx = stop_3d.shape
    occ = np.argwhere(stop_3d)  # (M, 3) in (z, y, x)
    out = np.empty((zz, yy, xx), np.int64)
    for z in range(zz):
        for y in range(yy):
            for x in range(xx):
                db = min(z + 1, zz - z, y + 1, yy - y, x + 1, xx - x)
                if len(occ):
                    d = np.abs(occ - np.array([z, y, x])).max(axis=1).min()
                    db = min(db, d)
                out[z, y, x] = db
    return out


def _unbrickify(flat, res):
    """(NB, 512) per-brick locals L=(lz*8+ly)*8+lx -> padded (Z, Y, X)."""
    nbx, nby, nbz = accel_mod.brick_dims(res)
    return (
        flat.reshape(nbz, nby, nbx, 8, 8, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(nbz * 8, nby * 8, nbx * 8)
    )


def _unpack_rows(acc, res):
    """Brick rows -> (stop (Z,Y,X) bool, D (BZ,BY,BX) u32), padded to brick
    multiples."""
    rows = np.asarray(acc.rows)
    nbx, nby, nbz = accel_mod.brick_dims(res)
    bits = np.unpackbits(
        np.ascontiguousarray(rows[:, :16]).view("<u1"), axis=1, bitorder="little"
    ).astype(bool)
    d = rows[:, accel_mod.DIST_W].reshape(nbz, nby, nbx)
    return _unbrickify(bits, res), d


def test_chebyshev_exact_vs_bruteforce():
    rng = np.random.default_rng(7)
    mask = rng.random((6, 7, 8)) < 0.04
    d = accel_mod.chebyshev_from_mask(mask)
    np.testing.assert_array_equal(
        d.astype(np.int64), np.minimum(_brute_chebyshev_mask(mask), 255)
    )


def test_brick_planes_exact(scene):
    """STOP bits == {v > iso} (pad voxels set), D == brick-level Chebyshev
    distance. (Materials are NOT in the rows: the march re-fetches the hit
    voxel's value — covered by the bit-equal raymarch/render tests.)"""
    _, vol_np, opts, acc = scene
    rx, ry, rz, _ = opts.voxelRes
    v = vol_np.reshape(rz, ry, rx)
    stop, d = _unpack_rows(acc, opts.voxelRes)
    np.testing.assert_array_equal(stop[:rz, :ry, :rx], v > opts.isoVal)
    assert stop[rz:].all() and stop[:, ry:].all() and stop[:, :, rx:].all()
    nbx, nby, nbz = accel_mod.brick_dims(opts.voxelRes)
    brick_stop = stop.reshape(nbz, 8, nby, 8, nbx, 8).any(axis=(1, 3, 5))
    np.testing.assert_array_equal(
        d.astype(np.int64), np.minimum(_brute_chebyshev_mask(brick_stop), 255)
    )


def test_brick_distance_bounded_by_boundary(scene):
    """No brick's distance may exceed its distance to the brick-grid
    boundary — the march must never skip past its first out-of-bounds
    exit."""
    _, vol_np, opts, acc = scene
    nbx, nby, nbz = accel_mod.brick_dims(opts.voxelRes)
    d = np.asarray(acc.rows)[:, accel_mod.DIST_W].reshape(nbz, nby, nbx)
    z, y, x = np.meshgrid(
        np.arange(nbz), np.arange(nby), np.arange(nbx), indexing="ij"
    )
    db = np.minimum.reduce([z + 1, nbz - z, y + 1, nby - y, x + 1, nbx - x])
    assert (d <= db).all()


def test_brick_planes_non_multiple_res():
    """Non-brick-multiple resolutions: pad voxels are STOP (so skips can
    never cross the boundary)."""
    rng = np.random.default_rng(3)
    res = (12, 9, 21)  # (rx, ry, rz)
    vol_np = (rng.random(res[2] * res[1] * res[0]) * 255).astype(np.uint8)
    acc = accel_mod.build_accel(vol_np, res, 32)
    stop, _ = _unpack_rows(acc, res)
    v = vol_np.reshape(res[2], res[1], res[0])
    np.testing.assert_array_equal(stop[: res[2], : res[1], : res[0]], v > 32)
    assert stop[res[2]:].all() and stop[:, res[1]:].all() and stop[:, :, res[0]:].all()


def test_raymarch_bit_equal(scene):
    vol, _, opts, acc = scene
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


def test_wide_substeps_bit_equal(scene):
    """Batched-substep resolve (march.WIDE_SUBSTEPS): identical per-element
    expressions on (N, S) operands + exact first-event recovery, so raymarch
    outputs must be EXACTLY equal to the serial substep loop on every
    backend — full carry, lean shadow configuration, and a non-default
    brick edge (the (N, S, W) word select at W=128)."""
    vol, vol_np, opts, acc = scene
    from raymarchcl_tpu.ops import accel as accel_mod

    rng = np.random.default_rng(23)
    n = 256
    rp = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    pv = V3.from_array(jnp.asarray(rp))
    dv = V3.from_array(jnp.asarray(rd))
    act = jnp.ones((n,), bool)
    lmax = jnp.asarray(rng.uniform(0.5, 3.0, n).astype(np.float32))
    accs = [acc]
    old = accel_mod.BRICK
    try:
        accel_mod.set_brick(16)
        accs.append(accel_mod.build_accel(vol_np, opts.voxelRes, opts.isoVal))
    finally:
        accel_mod.set_brick(old)

    def full(a):
        return march.raymarch(
            vol, opts, pv, dv, opts.maxDist, opts.maxIter, True, act,
            accel=a, want_stats=True,
        )

    def lean_shadow(a):
        return march.raymarch(
            vol, opts, pv, dv, lmax, opts.shadowIter, False, act,
            want_normal=False, accel=a, truncate_to_max_dist=True,
            want_object=False, want_stats=True,
        )

    assert march.WIDE_SUBSTEPS is True  # default ON since the HW A/B win
    for a in accs:
        try:
            march.WIDE_SUBSTEPS = False  # serial-loop baseline
            base_f, base_s = full(a), lean_shadow(a)
        finally:
            march.WIDE_SUBSTEPS = True
        wf, ws = full(a), lean_shadow(a)
        for k in ("distance", "object_id", "apps"):
            np.testing.assert_array_equal(np.asarray(base_f[k]), np.asarray(wf[k]))
        np.testing.assert_array_equal(
            np.asarray(base_f["normal"].to_array()),
            np.asarray(wf["normal"].to_array()),
        )
        for k in ("distance", "apps"):
            np.testing.assert_array_equal(np.asarray(base_s[k]), np.asarray(ws[k]))


def test_wide_ground_bit_equal(scene):
    """Batched ground block (march.WIDE_GROUND): the serial dist ladder +
    one wide (N, S) slab-test/bookkeeping block + exact first-event
    recovery must be EXACTLY equal to the serial ground loop on every
    backend — full carry and lean shadow configuration, at the default
    FLAT_GROUND_STEPS and an odd depth (non-power-of-2 prefix-AND)."""
    vol, vol_np, opts, acc = scene

    rng = np.random.default_rng(31)
    n = 256
    # bias ray origins outside the box so plenty of lanes run GROUND mode
    rp = rng.uniform(-4.0, 4.0, (n, 3)).astype(np.float32)
    rp[:, 1] = rng.uniform(-0.2, 3.0, n).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    pv = V3.from_array(jnp.asarray(rp))
    dv = V3.from_array(jnp.asarray(rd))
    act = jnp.ones((n,), bool)
    lmax = jnp.asarray(rng.uniform(0.5, 3.0, n).astype(np.float32))

    def full():
        return march.raymarch(
            vol, opts, pv, dv, opts.maxDist, opts.maxIter, True, act,
            accel=acc, want_stats=True,
        )

    def lean_shadow():
        return march.raymarch(
            vol, opts, pv, dv, lmax, opts.shadowIter, False, act,
            want_normal=False, accel=acc, truncate_to_max_dist=True,
            want_object=False, want_stats=True,
        )

    assert march.WIDE_GROUND is True  # default ON since the HW A/B win
    saved_gs = march.FLAT_GROUND_STEPS
    for gs in (saved_gs, 7):
        try:
            march.FLAT_GROUND_STEPS = gs
            march.WIDE_GROUND = False  # serial-loop baseline
            base_f, base_s = full(), lean_shadow()
            march.WIDE_GROUND = True
            wf, ws = full(), lean_shadow()
        finally:
            march.WIDE_GROUND = True
            march.FLAT_GROUND_STEPS = saved_gs
        for k in ("distance", "object_id", "apps"):
            np.testing.assert_array_equal(np.asarray(base_f[k]), np.asarray(wf[k]))
        np.testing.assert_array_equal(
            np.asarray(base_f["normal"].to_array()),
            np.asarray(wf["normal"].to_array()),
        )
        for k in ("distance", "apps"):
            np.testing.assert_array_equal(np.asarray(base_s[k]), np.asarray(ws[k]))


def test_march_volume_bit_equal_with_caps(scene):
    """march_volume parity incl. the max_k / max_k_dyn truncation paths."""
    vol, _, opts, acc = scene
    rng = np.random.default_rng(11)
    n = 512
    p0 = V3.from_array(jnp.asarray(rng.uniform(-0.4, 1.4, (n, 3)).astype(np.float32)))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    scale = 2.0 / opts.maxVoxelIter
    delta = V3.from_array(jnp.asarray(d * scale * 0.5))
    act = jnp.ones((n,), bool)
    mkd = jnp.asarray(rng.integers(0, opts.maxVoxelIter + 1, n, dtype=np.int32))
    for kwargs in (
        {},
        {"max_k": 7},
        {"max_k": 0},
        {"max_k_dyn": mkd},
        {"max_k": 13, "max_k_dyn": mkd},
    ):
        h_a, k_a = march.march_volume(
            vol, opts, p0, delta, opts.maxVoxelIter, act, **kwargs
        )
        h_b, k_b = march.march_volume(
            vol, opts, p0, delta, opts.maxVoxelIter, act, accel=acc, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(h_a), np.asarray(h_b))
        # the first stopping sample (hit OR first-exit) must agree exactly;
        # budget-exhausted rays leave hit_k at 0 on both paths
        np.testing.assert_array_equal(np.asarray(k_a), np.asarray(k_b))


def test_shadow_decisions_bit_equal(scene):
    """The truncate_to_max_dist path: shadow() consumes only
    `distance >= light_max_dist` — those decisions must match exactly."""
    import jax.numpy as jnp

    from raymarchcl_tpu.ops import shade
    from raymarchcl_tpu.ops.camera import camera_ray_lookat
    from raymarchcl_tpu.ops.sampling import init_render_state, transpose_table
    from raymarchcl_tpu.ops.vecmath import dot, normalize

    vol, _, opts, acc = scene
    tt = transpose_table(make_mc_tables(1, seed=4)[0])
    ids = jnp.arange(opts.num_pixels, dtype=jnp.int32)
    state = init_render_state(opts, tt, ids)
    rp, rd = camera_ray_lookat(opts, state)
    act = jnp.ones((opts.num_pixels,), bool)
    isec = march.raymarch(vol, opts, rp, rd, opts.maxDist, opts.maxIter, True, act)
    hit = np.asarray(isec["distance"]) < float(opts.maxDist)
    delta = shade.light_pos_jittered(opts, tt, state["px"], state["py"], 0) - isec["pos"]
    d2 = dot(delta, delta)
    ldir = normalize(delta)
    lmax = jnp.minimum(jnp.sqrt(d2) - opts.shadowBias, opts.maxDist)
    origin = isec["pos"] + ldir * opts.shadowBias
    kw = dict(smooth=False, want_normal=False, truncate_to_max_dist=True)
    sa = march.raymarch(vol, opts, origin, ldir, lmax, opts.shadowIter,
                        active=jnp.asarray(hit), **kw)
    sb = march.raymarch(vol, opts, origin, ldir, lmax, opts.shadowIter,
                        active=jnp.asarray(hit), accel=acc, **kw)
    da = np.asarray(sa["distance"] >= lmax)[hit]
    db = np.asarray(sb["distance"] >= lmax)[hit]
    np.testing.assert_array_equal(da, db)


def test_full_render_bit_equal(scene):
    vol, _, opts, acc = scene
    tables = make_mc_tables(2, seed=4)
    argb_plain, accum_plain = render_mod.render_image(vol, opts, tables)
    argb_acc, accum_acc = render_mod.render_image(vol, opts, tables, accel=acc)
    assert_renders_match(argb_acc, argb_plain, accum_acc, accum_plain)


def test_terrain_render_bit_equal():
    vol_np = generators.make_terrain({"vres": [64, 64, 64]})
    opts = render_options(
        width=32, height=24, vres=64, iter=1, mat="ao",
        maxIter=24, maxVoxelIter=48, shadowIter=24,
        eyepos=compute_eyepos(45.0, 2.5, 0.8), targetpos=[0, 0, 0],
    )
    acc = accel_mod.build_accel(vol_np, opts.voxelRes, opts.isoVal)
    vol = jnp.asarray(vol_np)
    tables = make_mc_tables(1, seed=1)
    a, _ = render_mod.render_image(vol, opts, tables)
    b, _ = render_mod.render_image(vol, opts, tables, accel=acc)
    assert_renders_match(b, a)


def test_empty_volume_all_skippable():
    vol_np = np.zeros(32**3, np.uint8)
    opts = render_options(width=8, height=8, vres=32, iter=1, maxVoxelIter=64)
    acc = accel_mod.build_accel(vol_np, opts.voxelRes, opts.isoVal)
    d = np.asarray(acc.rows)[:, accel_mod.DIST_W].reshape(4, 4, 4)
    assert d[2, 2, 2] == 2  # center brick: distance to boundary only
    vol = jnp.asarray(vol_np)
    tables = make_mc_tables(1, seed=0)
    a, _ = render_mod.render_image(vol, opts, tables)
    b, _ = render_mod.render_image(vol, opts, tables, accel=acc)
    assert_renders_match(b, a)


def test_dense_volume_render_bit_equal():
    """Fully-occupied volume: every interior distance is 0 — the accel must
    degrade to reference pace, not break."""
    vol_np = np.full(16**3, 255, np.uint8)
    opts = render_options(width=8, height=8, vres=16, iter=1, maxVoxelIter=32)
    acc = accel_mod.build_accel(vol_np, opts.voxelRes, opts.isoVal)
    assert np.asarray(acc.rows)[:, accel_mod.DIST_W].max() == 0
    vol = jnp.asarray(vol_np)
    tables = make_mc_tables(1, seed=3)
    a, _ = render_mod.render_image(vol, opts, tables)
    b, _ = render_mod.render_image(vol, opts, tables, accel=acc)
    assert_renders_match(b, a)


def test_brick_smooth_normal_bit_equal(scene):
    """The brick-staged occupancy block must reproduce the byte-gather
    smooth normal exactly, including all boundary truncations."""
    vol, _, opts, acc = scene
    rng = np.random.default_rng(3)
    rx, ry, rz, _ = opts.voxelRes
    # interior, boundary-straddling, and fully-out coords
    qs = np.concatenate([
        rng.integers(-3, [rx + 3, ry + 3, rz + 3], (512, 3)),
        np.array([[0, 0, 0], [rx - 1, ry - 1, rz - 1], [-2, 5, 5], [rx + 1, 5, 5]]),
    ]).astype(np.int32)
    q = V3(jnp.asarray(qs[:, 0]), jnp.asarray(qs[:, 1]), jnp.asarray(qs[:, 2]))
    a = march.voxel_normal_smooth(vol, opts, q)
    b = march.voxel_normal_smooth(vol, opts, q, accel=acc)
    np.testing.assert_array_equal(np.asarray(a.to_array()), np.asarray(b.to_array()))


def test_mxu_onehot_rows_bit_equal(scene):
    """The MXU one-hot row gather must reproduce jnp.take exactly (every
    byte payload is bf16-exact and each sum has one nonzero term)."""
    _, _, opts, acc = scene
    assert acc.rows_mxu is not None  # small scene -> MXU tables built
    rng = np.random.default_rng(9)
    for table, mxu, w in (
        (acc.rows, acc.rows_mxu, accel_mod.ROW_WORDS),
        (acc.nrm_rows, acc.nrm_mxu, accel_mod.NRM_ROW_WORDS),
    ):
        bid = jnp.asarray(
            rng.integers(0, table.shape[0], 777, dtype=np.int32)
        )
        got = np.asarray(march._mxu_rows(mxu, bid, w))
        want = np.asarray(jnp.take(table, bid, axis=0))
        np.testing.assert_array_equal(got, want)


def test_mxu_large_table_falls_back():
    """Tables above ONEHOT_MAX_ROWS must not build MXU byte planes, and the
    jnp.take fallback row gather must stay bit-equal to the plain march.
    vres (160, 128, 128) -> 5120 bricks / 7128 normal windows, both over the
    4096-row cap, so BOTH fallback paths are actually exercised."""
    rng = np.random.default_rng(1)
    vres = (160, 128, 128)
    vol_np = (rng.random(int(np.prod(vres))) * 255).astype(np.uint8)
    acc = accel_mod.build_accel(vol_np, vres, 32)
    assert acc.rows.shape[0] > accel_mod.ONEHOT_MAX_ROWS
    assert acc.nrm_rows.shape[0] > accel_mod.ONEHOT_MAX_ROWS
    assert acc.rows_mxu is None and acc.nrm_mxu is None

    opts = render_options(
        width=8, height=8, vres=list(vres), iter=1, mat="ao",
        maxIter=24, maxVoxelIter=48, shadowIter=24,
    )
    vol = jnp.asarray(vol_np)
    rng2 = np.random.default_rng(5)
    n = 128
    rp = rng2.uniform(-2.0, 2.0, (n, 3)).astype(np.float32)
    rd = rng2.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    pv = V3.from_array(jnp.asarray(rp))
    dv = V3.from_array(jnp.asarray(rd))
    act = jnp.ones((n,), bool)
    a = march.raymarch(vol, opts, pv, dv, opts.maxDist, opts.maxIter, True, act)
    b = march.raymarch(
        vol, opts, pv, dv, opts.maxDist, opts.maxIter, True, act, accel=acc
    )
    np.testing.assert_array_equal(np.asarray(a["distance"]), np.asarray(b["distance"]))
    np.testing.assert_array_equal(np.asarray(a["object_id"]), np.asarray(b["object_id"]))
    np.testing.assert_array_equal(
        np.asarray(a["normal"].to_array()), np.asarray(b["normal"].to_array())
    )


def test_banded_march_integer_exact(scene):
    """CPU-exact scheduling invariant (VERDICT r2 item 7): the primary
    march's INTEGER outputs (object_id) are bit-equal between monolithic and
    band-scanned scheduling on every backend — XLA:CPU's context-dependent
    FMA contraction moves float distances by relative ULPs (~3e-7 measured)
    but never the integer hit classification on this scene. This gives CI a
    band-scheduling regression check that doesn't need TPU hardware.
    (Full-render CPU exactness is impossible: the ULP position drift
    re-seeds secondary-march jitter and occasionally flips shading
    thresholds — see assert_renders_match.)"""
    import jax

    from raymarchcl_tpu.ops.camera import camera_ray_lookat
    from raymarchcl_tpu.ops.sampling import init_render_state, transpose_table

    vol, _, opts, acc = scene
    table_t = transpose_table(make_mc_tables(1, seed=9)[0])
    n = opts.num_pixels
    ids = jnp.arange(n, dtype=jnp.int32)

    def march_ids(ids_t, accel):
        state = init_render_state(opts, table_t, ids_t)
        rp, rd = camera_ray_lookat(opts, state)
        act = jnp.ones((ids_t.shape[0],), bool)
        isec = march.raymarch(
            vol, opts, rp, rd, opts.maxDist, opts.maxIter,
            smooth=True, active=act, want_normal=True, accel=accel,
        )
        return isec["object_id"], isec["distance"]

    for accel in (None, acc):
        o1, d1 = jax.tree_util.tree_map(np.asarray, march_ids(ids, accel))
        _, out = jax.lax.scan(
            lambda _, ids_t: (None, march_ids(ids_t, accel)),
            None, ids.reshape(4, n // 4),
        )
        o4, d4 = jax.tree_util.tree_map(
            lambda a: np.asarray(a).reshape(n), out
        )
        np.testing.assert_array_equal(o1, o4)  # exact, incl. on CPU
        # float distances carry ULP-relative drift only (far ground hits at
        # d~25 differ by ~8e-6 absolute = 3e-7 relative)
        np.testing.assert_allclose(d1, d4, rtol=1e-6, atol=2e-6)


def test_compact_secondary_matches(scene):
    """Active-lane-compacted secondary loops (render.COMPACT_SECONDARY +
    shade.shade_after_march_compact) vs the monolithic shade band, on a
    reflective preset (metal: 3 bounces, 2 lights) where the compact path
    engages. Grouping-only — bit-equal on TPU (scripts/tpu_invariants.py
    compact_secondary_on_off); CPU gets the standard FMA-contraction
    allowance like every banding invariant."""
    vol, _, _, _ = scene
    opts = render_options(
        width=256, height=48, vres=[32, 32, 96], iter=3, mat="metal",
        maxIter=24, maxVoxelIter=48, shadowIter=24,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    acc = accel_mod.build_accel(
        generators.make_gyroid_volume({"vres": [32, 32, 96]}),
        opts.voxelRes, opts.isoVal,
    )
    assert render_mod.auto_tiles(opts.num_pixels) > 1  # deferred path active
    assert opts.reflectIter > 0  # the compact path's domain
    tables = make_mc_tables(3, seed=7)
    times = jnp.arange(3, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)
    saved = (render_mod.COMPACT_SECONDARY, render_mod.PASS_STACK)
    try:
        # PASS_STACK=1 isolates the compaction diff: with stacking enabled
        # the COMPACT_SECONDARY=True side would ALSO engage the stacked
        # reflective engine (render.STACK_REFLECTIVE), crossing two
        # restructurings at once (that path has its own test below)
        render_mod.PASS_STACK = 1
        outs = {}
        for flag in (False, True):
            render_mod.COMPACT_SECONDARY = flag
            outs[flag] = np.asarray(
                render_mod.render_accum(vol, opts, tables, times, accum0,
                                        accel=acc)
            )
        a, b = outs[False], outs[True]
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-3)
        bad = (rel.max(axis=1) > 1e-3).mean()
        assert bad < 0.01, f"{bad:.2%} of pixels differ beyond drift"
        np.testing.assert_allclose(np.median(a, 0), np.median(b, 0), rtol=1e-5)
    finally:
        render_mod.COMPACT_SECONDARY, render_mod.PASS_STACK = saved


def test_compact_perm_partition():
    """_compact_perm is a stable-partition rank (actives first, original
    order within classes), and the packed scatter-in / gather-out
    round-trips bit-exactly for every leaf dtype."""
    from raymarchcl_tpu.ops import shade

    rng = np.random.default_rng(5)
    act = jnp.asarray(rng.random(4096) < 0.23)
    rank = np.asarray(shade._compact_perm(act))
    a = np.asarray(act)
    n_act = int(a.sum())
    # rank is a permutation; actives land at [0, n_act) in original order
    np.testing.assert_array_equal(np.sort(rank), np.arange(4096))
    np.testing.assert_array_equal(np.sort(rank[a]), np.arange(n_act))
    assert (np.diff(rank[a]) > 0).all() and (np.diff(rank[~a]) > 0).all()
    # packed round-trip: scatter-by-rank then gather-by-rank is identity,
    # exact for f32 (incl. NaN/-0.0), int32, bool
    f = rng.standard_normal(4096).astype(np.float32)
    f[:4] = [np.nan, -0.0, np.inf, -np.inf]
    tree = {"f": jnp.asarray(f), "i": jnp.asarray(rng.integers(-2**31, 2**31 - 1, 4096, dtype=np.int32)), "b": act}
    mat, leaves, tdef = shade._pack_u32(tree)
    mat_c = jnp.zeros_like(mat).at[jnp.asarray(rank)].set(mat)
    back = shade._unpack_u32(
        jnp.take(mat_c, jnp.asarray(rank), axis=0), leaves, tdef)
    np.testing.assert_array_equal(
        np.asarray(back["f"]).view(np.uint32), f.view(np.uint32))
    np.testing.assert_array_equal(np.asarray(back["i"]), np.asarray(tree["i"]))
    np.testing.assert_array_equal(np.asarray(back["b"]), a)


def test_cost_sorted_accum_matches_sequential(scene):
    """The cost-sorted multi-pass path in render_accum (prev_cost carry,
    max-filtered band sort, perm_total unsort, decaying-max cost update) vs
    sequential single-pass renders. >= 2*TILE_RAYS pixels so auto_tiles > 1
    and the cost path is actually taken; iter=3 so passes 2-3 render
    cost-sorted.
    Tolerance-based on CPU (FMA contraction — advisor measured max rel
    1.4e-7 pure drift); bit-equal on TPU (scripts/tpu_invariants.py)."""
    vol, _, _, acc = scene
    opts = render_options(
        width=256, height=48, vres=[32, 32, 96], iter=3, mat="ao",
        maxIter=24, maxVoxelIter=48, shadowIter=24,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    n = opts.num_pixels
    assert render_mod.auto_tiles(n) > 1  # cost-sorted path is active
    tables = make_mc_tables(3, seed=7)
    times = jnp.arange(3, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((n, 3), jnp.float32)
    got = np.asarray(
        render_mod.render_accum(vol, opts, tables, times, accum0, accel=acc)
    )
    acc_seq = accum0
    for i in range(3):
        acc_seq = render_mod.render_pass(
            vol, opts.replace(time=times[i]), tables[i], acc_seq, accel=acc
        )
    want = np.asarray(acc_seq)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
    bad = (rel.max(axis=1) > 1e-3).mean()
    assert bad < 0.01, f"{bad:.2%} of pixels differ beyond drift tolerance"
    np.testing.assert_allclose(
        np.median(got, 0), np.median(want, 0), rtol=1e-5
    )


def test_pass_stacked_accum_matches_sequential(scene):
    """render.PASS_STACK: P passes stacked as (N, P) trailing lanes through
    the march/shade state machines + sequential post-blend vs the plain
    per-pass scan. Every lane's per-pass math is elementwise-identical
    (each seed site threads the lane's own pass time/table block) and the
    blend association is unchanged, so this is grouping-only: bit-equal on
    TPU, tolerance on CPU (stacking changes FMA contraction opportunities,
    like every banding invariant here)."""
    vol, _, _, acc = scene
    opts = render_options(
        width=256, height=48, vres=[32, 32, 96], iter=4, mat="ao",
        maxIter=24, maxVoxelIter=48, shadowIter=24,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    n = opts.num_pixels
    assert render_mod.auto_tiles(n) > 1  # deferred path is active
    tables = make_mc_tables(4, seed=7)
    times = jnp.arange(4, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((n, 3), jnp.float32)
    saved = render_mod.PASS_STACK
    try:
        render_mod.PASS_STACK = 1
        want = np.asarray(
            render_mod.render_accum(vol, opts, tables, times, accum0, accel=acc)
        )
        for p in (2, 4):
            render_mod.PASS_STACK = p
            got = np.asarray(
                render_mod.render_accum(
                    vol, opts, tables, times, accum0, accel=acc
                )
            )
            rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
            bad = (rel.max(axis=1) > 1e-3).mean()
            assert bad < 0.01, (
                f"P={p}: {bad:.2%} of pixels differ beyond drift tolerance"
            )
            np.testing.assert_allclose(
                np.median(got, 0), np.median(want, 0), rtol=1e-5
            )
        # non-dividing P resolves to the largest dividing stack (3 -> 2 at
        # 4 passes) — still value-identical to the sequential scan
        render_mod.PASS_STACK = 3
        got = np.asarray(
            render_mod.render_accum(vol, opts, tables, times, accum0, accel=acc)
        )
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
        assert (rel.max(axis=1) > 1e-3).mean() < 0.01
    finally:
        render_mod.PASS_STACK = saved


def test_pass_stacked_head_tail_matches_sequential(scene):
    """Head+tail stacking: a pass count with no divisor near PASS_STACK
    runs full stacked groups plus an UNSTACKED tail that continues the
    head's cost history (render_accum; e.g. BASELINE config 2's 25 spp =
    3x8 + 1). 5 passes at PASS_STACK=4 -> one stacked group of 4 + 1 tail
    pass; value-identical to the sequential per-pass scan."""
    vol, _, _, acc = scene
    opts = render_options(
        width=256, height=48, vres=[32, 32, 96], iter=5, mat="ao",
        maxIter=24, maxVoxelIter=48, shadowIter=24,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    n = opts.num_pixels
    tables = make_mc_tables(5, seed=9)
    times = jnp.arange(5, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((n, 3), jnp.float32)
    saved = render_mod.PASS_STACK
    try:
        render_mod.PASS_STACK = 1
        want = np.asarray(
            render_mod.render_accum(vol, opts, tables, times, accum0,
                                    accel=acc)
        )
        render_mod.PASS_STACK = 4  # 5 = 4 (stacked) + 1 (tail)
        got = np.asarray(
            render_mod.render_accum(vol, opts, tables, times, accum0,
                                    accel=acc)
        )
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
        bad = (rel.max(axis=1) > 1e-3).mean()
        assert bad < 0.01, f"{bad:.2%} of pixels differ beyond drift tolerance"
        np.testing.assert_allclose(
            np.median(got, 0), np.median(want, 0), rtol=1e-5
        )
    finally:
        render_mod.PASS_STACK = saved


@pytest.mark.parametrize("edge", [4, 16])
def test_brick_edge_bit_equal(scene, edge):
    """accel.set_brick: the march contracts hold at any brick edge B
    (d_equiv = B*D - (B-1)), and per-lane float op sequences are identical
    across edges — raymarch outputs must be EXACTLY equal to the default
    8^3 table on every backend, for the full carry and the lean shadow
    configuration."""
    vol, vol_np, opts, acc = scene
    rng = np.random.default_rng(23)
    n = 256
    rp = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    pv = V3.from_array(jnp.asarray(rp))
    dv = V3.from_array(jnp.asarray(rd))
    act = jnp.ones((n,), bool)
    lmax = jnp.asarray(rng.uniform(0.5, 3.0, n).astype(np.float32))

    def runs(a):
        full = march.raymarch(
            vol, opts, pv, dv, opts.maxDist, opts.maxIter, True, act, accel=a
        )
        shadow = march.raymarch(
            vol, opts, pv, dv, lmax, opts.shadowIter, False, act,
            want_normal=False, accel=a, truncate_to_max_dist=True,
            want_object=False,
        )
        return full, shadow

    assert accel_mod.BRICK == 8  # production default
    base_f, base_s = runs(acc)
    try:
        accel_mod.set_brick(edge)
        acc_e = accel_mod.build_accel(vol_np, opts.voxelRes, opts.isoVal)
        assert acc_e.rows.shape[1] == accel_mod.ROW_WORDS
        # normal windows are edge-independent (fixed 8-stride grid)
        np.testing.assert_array_equal(
            np.asarray(acc_e.nrm_rows), np.asarray(acc.nrm_rows)
        )
        got_f, got_s = runs(acc_e)
    finally:
        accel_mod.set_brick(8)
    for k in ("distance", "object_id"):
        np.testing.assert_array_equal(np.asarray(base_f[k]), np.asarray(got_f[k]))
    np.testing.assert_array_equal(
        np.asarray(base_f["normal"].to_array()),
        np.asarray(got_f["normal"].to_array()),
    )
    np.testing.assert_array_equal(
        np.asarray(base_s["distance"]), np.asarray(got_s["distance"])
    )




def test_prepass_cost_seed_matches_and_gates(scene):
    """render.PREPASS_STRIDE: the strided instrumented prepass that seeds
    the first pass's band sorts (group-0 cold start; PERFORMANCE.md round 5,
    scripts/study_group0_key.py). The prepass color is discarded and the
    seed only reorders bands, so outputs match the prepass-off render
    (bit-equal on TPU — asserted by scripts/tpu_invariants.py / bench.py's
    gate; tolerance here, like every banding invariant on CPU). Shapes
    whose lane block isn't a whole number of STRIDE-aligned rows, or whose
    coarse grid is under 1024 cells, must fall back to the zero seed."""
    vol, _, _, acc = scene
    # 256 x 64 at stride 4 -> coarse 16 x 64 = 1024 cells: gate passes
    opts = render_options(
        width=256, height=64, vres=[32, 32, 96], iter=4, mat="ao",
        maxIter=24, maxVoxelIter=48, shadowIter=24,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    n = opts.num_pixels
    assert render_mod.auto_tiles(n) > 1
    tables = make_mc_tables(4, seed=11)
    times = jnp.arange(4, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((n, 3), jnp.float32)
    saved = (render_mod.PASS_STACK, render_mod.PREPASS_STRIDE)
    try:
        render_mod.PASS_STACK = 4
        render_mod.PREPASS_STRIDE = 0
        want = np.asarray(
            render_mod.render_accum(vol, opts, tables, times, accum0,
                                    accel=acc))
        render_mod.PREPASS_STRIDE = 4
        # the gate must actually engage at this shape
        from raymarchcl_tpu.ops.sampling import transpose_table
        pre = render_mod._prepass_cost(
            vol, opts.replace(time=times[0]), transpose_table(tables[0]),
            jnp.arange(n, dtype=jnp.int32), acc, n, 256)
        assert pre is not None and set(pre) == {"a", "b"}
        assert pre["a"].shape == (n,)
        # stride-4 upsample: constant over each 4x4 cell
        grid = np.asarray(pre["b"]).reshape(64, 256)
        np.testing.assert_array_equal(grid[::1, :], np.repeat(
            np.repeat(grid[::4, ::4], 4, axis=0), 4, axis=1))
        got = np.asarray(
            render_mod.render_accum(vol, opts, tables, times, accum0,
                                    accel=acc))
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
        bad = (rel.max(axis=1) > 1e-3).mean()
        assert bad < 0.01, f"{bad:.2%} of pixels differ beyond tolerance"
        np.testing.assert_allclose(
            np.median(got, 0), np.median(want, 0), rtol=1e-5)
        # gate refusals: misaligned row block / tiny coarse grid
        assert render_mod._prepass_cost(
            vol, opts.replace(time=times[0]), transpose_table(tables[0]),
            jnp.arange(n - 256, dtype=jnp.int32), acc, n - 256, 256
        ) is None or (n - 256) // 256 % 4 == 0  # 63 rows: not stride-aligned
        assert render_mod._prepass_cost(
            vol, opts.replace(time=times[0]), transpose_table(tables[0]),
            jnp.arange(4096, dtype=jnp.int32), acc, 4096, 256) is None
    finally:
        render_mod.PASS_STACK, render_mod.PREPASS_STRIDE = saved


def test_stacked_reflective_matches_sequential(scene):
    """render.STACK_REFLECTIVE: reflective passes stacked as (N, P) lanes
    with the compacted secondary loops POOLED per lane (each lane packs by
    its own active flag; pass identity rides as per-lane opts.time rows +
    explicit table-block offsets — sampling._table_idx block=). Per-lane
    math is identical to the sequential per-pass renders, so this is
    grouping-only: bit-equal on TPU (hardware A/B at config-4 spec,
    PERFORMANCE.md round 5), FMA-contraction tolerance here on CPU."""
    vol, _, _, acc = scene
    opts = render_options(
        width=256, height=48, vres=[32, 32, 96], iter=4, mat="metal",
        maxIter=24, maxVoxelIter=48, shadowIter=24,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    assert opts.reflectIter > 0
    tables = make_mc_tables(4, seed=7)
    times = jnp.arange(4, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((opts.num_pixels, 3), jnp.float32)
    saved = (render_mod.PASS_STACK, render_mod.STACK_REFLECTIVE)
    try:
        render_mod.PASS_STACK = 1
        want = np.asarray(
            render_mod.render_accum(vol, opts, tables, times, accum0,
                                    accel=acc))
        render_mod.PASS_STACK = 4
        render_mod.STACK_REFLECTIVE = True
        got = np.asarray(
            render_mod.render_accum(vol, opts, tables, times, accum0,
                                    accel=acc))
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
        bad = (rel.max(axis=1) > 1e-3).mean()
        assert bad < 0.01, f"{bad:.2%} of pixels differ beyond drift"
        np.testing.assert_allclose(
            np.median(got, 0), np.median(want, 0), rtol=1e-4)
    finally:
        render_mod.PASS_STACK, render_mod.STACK_REFLECTIVE = saved


def test_stack_p_reflective_lane_clamp():
    """render.stack_p: reflective presets clamp P so n*P stays under the
    pooled phase-B HBM budget (STACK_REFLECTIVE_MAX_LANES — 1024^2 x P=8
    measured OOM on v5e at 18.04G/15.75G HBM; P=4 fits). Bounce-free
    presets never clamp (no pooled N*P matrices in that engine)."""
    saved = (render_mod.PASS_STACK, render_mod.STACK_REFLECTIVE_MAX_LANES)
    try:
        render_mod.PASS_STACK = 8
        render_mod.STACK_REFLECTIVE_MAX_LANES = 5_000_000
        assert render_mod.stack_p(512 * 512, 16, True) == 8  # 2.1M lanes
        assert render_mod.stack_p(1024 * 1024, 8, True) == 4  # 8.4M -> 4.2M
        assert render_mod.stack_p(1024 * 1024, 100, True) == 4
        assert render_mod.stack_p(1024 * 1024, 8, False) == 8  # no clamp
        assert render_mod.stack_p(6_000_000, 8, True) == 1  # nothing fits
        # sharded frames see per-shard n and keep full P
        assert render_mod.stack_p(1024 * 1024 // 8, 8, True) == 8
    finally:
        render_mod.PASS_STACK, render_mod.STACK_REFLECTIVE_MAX_LANES = saved


def test_stacked_reflective_lane_clamp_matches_sequential(scene):
    """The HBM-budget clamp (stack_p with a reduced
    STACK_REFLECTIVE_MAX_LANES) engages mid-frame-size and the clamped-P
    stacked render stays value-identical to the sequential per-pass scan
    — i.e. the clamp only changes grouping, like every P."""
    vol, _, _, acc = scene
    opts = render_options(
        width=256, height=48, vres=[32, 32, 96], iter=4, mat="metal",
        maxIter=24, maxVoxelIter=48, shadowIter=24,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    assert opts.reflectIter > 0
    n = opts.num_pixels
    tables = make_mc_tables(4, seed=7)
    times = jnp.arange(4, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    accum0 = jnp.zeros((n, 3), jnp.float32)
    saved = (render_mod.PASS_STACK, render_mod.STACK_REFLECTIVE,
             render_mod.STACK_REFLECTIVE_MAX_LANES)
    try:
        render_mod.PASS_STACK = 1
        want = np.asarray(
            render_mod.render_accum(vol, opts, tables, times, accum0,
                                    accel=acc))
        render_mod.PASS_STACK = 4
        render_mod.STACK_REFLECTIVE = True
        render_mod.STACK_REFLECTIVE_MAX_LANES = n * 2  # clamps P 4 -> 2
        assert render_mod.stack_p(n, 4, True) == 2
        got = np.asarray(
            render_mod.render_accum(vol, opts, tables, times, accum0,
                                    accel=acc))
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
        bad = (rel.max(axis=1) > 1e-3).mean()
        assert bad < 0.01, f"{bad:.2%} of pixels differ beyond drift"
        np.testing.assert_allclose(
            np.median(got, 0), np.median(want, 0), rtol=1e-4)
    finally:
        (render_mod.PASS_STACK, render_mod.STACK_REFLECTIVE,
         render_mod.STACK_REFLECTIVE_MAX_LANES) = saved
