"""Blob-replay compatibility: rendering from TRenderOpts bytes must equal
rendering from the equivalent RenderOpts."""

import numpy as np

from raymarchcl_tpu import compat, options_codec as codec
from raymarchcl_tpu.models import generators
from raymarchcl_tpu.ops import render as render_mod
from raymarchcl_tpu.ops.camera import compute_eyepos
from raymarchcl_tpu.ops.sampling import make_mc_tables
from raymarchcl_tpu.options import render_options

import jax.numpy as jnp


def test_blob_roundtrip_render_equal():
    vol_np = generators.make_gyroid_volume({"vres": [24, 24, 48]})
    tables = make_mc_tables(2, seed=3)
    opts = [
        render_options(
            width=24, height=16, vres=[24, 24, 48], iter=2, mat="metal",
            t=i * 0.333, maxIter=24, maxVoxelIter=48, shadowIter=24,
            eyepos=compute_eyepos(135, 2.25, 0.35), targetpos=[0, -0.4, 0],
        )
        for i in range(2)
    ]
    blobs = [codec.encode(o) for o in opts]
    argb_blob, _ = compat.render_from_blobs(blobs, vol_np, tables, accel=False)
    argb_direct, _ = render_mod.render_image(
        jnp.asarray(vol_np), opts[0], tables,
        times=jnp.asarray([0.0, 0.333], jnp.float32),
    )
    np.testing.assert_array_equal(argb_blob, argb_direct)


def test_opts_from_blob_fields():
    o = render_options(width=80, height=45, vres=32, iter=4, mat="orange-stripes")
    o2 = compat.opts_from_blob(codec.encode(o))
    assert o2.resolution == (80, 45)
    assert o2.reflectIter == 1 and o2.numLights == 2
    np.testing.assert_allclose(np.asarray(o2.mat_albedo), np.asarray(o.mat_albedo))
    np.testing.assert_allclose(float(o2.frameBlend), 0.25)
