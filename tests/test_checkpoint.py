"""Checkpoint/resume tests: chunked+checkpointed renders must be
bit-identical to uninterrupted ones (SURVEY.md §5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raymarchcl_tpu.io import checkpoint
from raymarchcl_tpu.models import generators
from raymarchcl_tpu.ops import render as render_mod
from raymarchcl_tpu.ops.camera import compute_eyepos
from raymarchcl_tpu.ops.sampling import make_mc_tables
from raymarchcl_tpu.options import render_options


@pytest.fixture(scope="module")
def scene():
    vol = jnp.asarray(generators.make_gyroid_volume({"vres": [16, 16, 48]}))
    opts = render_options(
        width=24, height=16, vres=[16, 16, 48], iter=5, mat="ao",
        maxIter=16, maxVoxelIter=32, shadowIter=16,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    return vol, opts, make_mc_tables(5, seed=2)


def test_save_load_roundtrip(tmp_path, scene):
    _, opts, _ = scene
    accum = np.random.default_rng(0).random((opts.num_pixels, 3)).astype(np.float32)
    p = checkpoint.save_accum(tmp_path / "ck", accum, opts, passes_done=3, seed=2)
    loaded, meta = checkpoint.load_accum(p, opts)
    np.testing.assert_array_equal(loaded, accum)
    assert meta["passes_done"] == 3 and meta["seed"] == 2


def test_resolution_mismatch_rejected(tmp_path, scene):
    _, opts, _ = scene
    accum = np.zeros((opts.num_pixels, 3), np.float32)
    p = checkpoint.save_accum(tmp_path / "ck", accum, opts, 1)
    other = render_options(width=8, height=8, vres=16, iter=1)
    with pytest.raises(ValueError):
        checkpoint.load_accum(p, other)


def test_chunked_equals_straight(tmp_path, scene):
    vol, opts, tables = scene
    argb_1, accum_1 = render_mod.render_image(vol, opts, tables)
    argb_c, accum_c = checkpoint.render_checkpointed(
        vol, opts, tables, tmp_path / "ck", chunk=2
    )
    np.testing.assert_array_equal(argb_c, argb_1)
    np.testing.assert_array_equal(np.asarray(accum_c), np.asarray(accum_1))


def test_resume_after_interrupt(tmp_path, scene):
    vol, opts, tables = scene
    argb_1, _ = render_mod.render_image(vol, opts, tables)
    # simulate an interrupted run: only the first 2 chunks got through
    seen = []
    try:
        checkpoint.render_checkpointed(
            vol, opts, tables, tmp_path / "ck", chunk=2,
            progress=lambda done, total: (_ for _ in ()).throw(KeyboardInterrupt)
            if done >= 4 and not seen.append(done)
            else seen.append(done),
        )
    except KeyboardInterrupt:
        pass
    assert max(seen) >= 2
    # resume completes and matches the uninterrupted render exactly
    argb_r, _ = checkpoint.render_checkpointed(
        vol, opts, tables, tmp_path / "ck", chunk=2
    )
    np.testing.assert_array_equal(argb_r, argb_1)


def test_fully_resumed_tonemaps_loaded_state(tmp_path, scene):
    vol, opts, tables = scene
    argb_1, accum_1 = render_mod.render_image(vol, opts, tables)
    checkpoint.save_accum(tmp_path / "ck", np.asarray(accum_1), opts, len(tables))
    argb_r, _ = checkpoint.render_checkpointed(
        vol, opts, tables, tmp_path / "ck", chunk=2
    )
    np.testing.assert_array_equal(argb_r, argb_1)


def test_mismatched_digest_rejected(tmp_path, scene):
    """Resuming against a checkpoint written for different MC tables/times
    must fail loudly instead of silently blending mismatched passes."""
    vol, opts, tables = scene
    checkpoint.render_checkpointed(vol, opts, tables[:2], tmp_path / "ck", chunk=1)
    other_tables = make_mc_tables(2, seed=99)
    with pytest.raises(ValueError, match="digest"):
        checkpoint.render_checkpointed(
            vol, opts, other_tables, tmp_path / "ck", chunk=1
        )
