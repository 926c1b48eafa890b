"""TRenderOpts binary layout round-trip tests (reference struct:
renderer.cl:35-78, marshalled by structgen in core.clj:101-106)."""

import math

import numpy as np
import pytest

from raymarchcl_tpu import options_codec as codec
from raymarchcl_tpu.options import render_options


def test_layout_alignment_rules():
    fields, size = codec.layout()
    by_name = {f[0]: f for f in fields}
    # first ten float3 fields pack at 16-byte strides
    assert by_name["eyePos"][3] == 0
    assert by_name["targetPos"][3] == 16
    assert by_name["skyColor2"][3] == 144
    assert by_name["voxelRes"][3] == 160  # int4 aligns 16
    assert by_name["resolution"][3] == 176  # int2 aligns 8
    # scalar run packs densely from 184
    assert by_name["invAspect"][3] == 184
    assert by_name["time"][3] == 188
    # uchar pair after mcTableLength
    assert by_name["isoVal"][3] == by_name["mcTableLength"][3] + 4
    assert by_name["numLights"][3] == by_name["isoVal"][3] + 1
    # float4 arrays align to 16
    assert by_name["lightPos"][3] % 16 == 0
    assert by_name["lightColor"][3] == by_name["lightPos"][3] + 64
    assert by_name["materials"][3] == by_name["lightColor"][3] + 64
    assert size == by_name["materials"][3] + 4 * 32
    assert size % 16 == 0


def test_roundtrip():
    o = render_options(width=640, height=360, vres=256, iter=4, mat="metal", t=0.999)
    blob = codec.encode(o)
    assert len(blob) == codec.struct_size()
    d = codec.decode(blob)
    assert d["resolution"] == [640, 360]
    assert d["voxelRes"] == [256, 256, 256, 65536]
    assert d["maxIter"] == 128 and d["maxVoxelIter"] == 192
    assert d["isoVal"] == 32 and d["numLights"] == 2
    assert d["reflectIter"] == 3
    np.testing.assert_allclose(d["frameBlend"], 0.25)
    np.testing.assert_allclose(d["time"], 0.999, rtol=1e-6)
    np.testing.assert_allclose(d["fov"], math.radians(90), rtol=1e-6)
    np.testing.assert_allclose(d["eyePos"], [2, 0, 2])
    np.testing.assert_allclose(d["lightPos"][0], [0, 2, 0, 0])
    np.testing.assert_allclose(d["lightColor"][1], [16, 36, 56, 0])
    np.testing.assert_allclose(d["materials"][2]["albedo"], [0.25, 0.27, 0.5, 1.0])
    np.testing.assert_allclose(d["materials"][2]["r0"], 0.7)
    np.testing.assert_allclose(d["invVoxelScale"], [0.5, 0.5, 0.5])
    np.testing.assert_allclose(d["voxelBoundsMin"], [-0.99] * 3, rtol=1e-6)


def test_uchar_fields_do_not_corrupt_neighbors():
    o = render_options(iter=1, mat="ao", isoVal=255)
    d = codec.decode(codec.encode(o))
    assert d["isoVal"] == 255
    assert d["numLights"] == 1
    assert d["mcTableLength"] == 0x4000
