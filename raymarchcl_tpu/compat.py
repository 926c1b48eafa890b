"""Byte-level compatibility entry: render directly from a TRenderOpts blob.

Ties the binary codec (options_codec.py) to the renderer: given the exact
bytes the reference host would enqueue as its option buffer
(core.clj:104-105), an externally-supplied MC sample table, and a `.vox`
volume, produce the frame. This is the strongest cross-implementation
harness: a reference run's inputs can be captured and replayed here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import options_codec as codec
from .options import MC_TABLE_LENGTH, RenderOpts


def opts_from_blob(blob: bytes) -> RenderOpts:
    """TRenderOpts bytes -> RenderOpts pytree."""
    d = codec.decode(blob)
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    mats = d["materials"]
    return RenderOpts(
        resolution=tuple(int(v) for v in d["resolution"]),
        voxelRes=tuple(int(v) for v in d["voxelRes"]),
        maxIter=int(d["maxIter"]),
        maxVoxelIter=int(d["maxVoxelIter"]),
        shadowIter=int(d["shadowIter"]),
        aoIter=int(d["aoIter"]),
        reflectIter=int(d["reflectIter"]),
        numLights=int(d["numLights"]),
        isoVal=int(d["isoVal"]),
        mcTableLength=int(d["mcTableLength"]) or MC_TABLE_LENGTH,
        voxelBounds=tuple(d["voxelBounds"]),
        voxelBounds2=tuple(d["voxelBounds2"]),
        voxelBoundsMin=tuple(d["voxelBoundsMin"]),
        voxelBoundsMax=tuple(d["voxelBoundsMax"]),
        invVoxelScale=tuple(d["invVoxelScale"]),
        aoStepDist=float(d["aoStepDist"]),
        voxelSize=float(d["voxelSize"]),
        eyePos=f32(d["eyePos"]),
        targetPos=f32(d["targetPos"]),
        up=f32(d["up"]),
        skyColor1=f32(d["skyColor1"]),
        skyColor2=f32(d["skyColor2"]),
        invAspect=f32(d["invAspect"]),
        time=f32(d["time"]),
        fov=f32(d["fov"]),
        maxDist=f32(d["maxDist"]),
        startDist=f32(d["startDist"]),
        eps=f32(d["eps"]),
        aoAmp=f32(d["aoAmp"]),
        groundY=f32(d["groundY"]),
        shadowBias=f32(d["shadowBias"]),
        lightScatter=f32(d["lightScatter"]),
        minLightAtt=f32(d["minLightAtt"]),
        gamma=f32(d["gamma"]),
        exposure=f32(d["exposure"]),
        dof=f32(d["dof"]),
        frameBlend=f32(d["frameBlend"]),
        fogPow=f32(d["fogPow"]),
        flareAmp=f32(d["flareAmp"]),
        lightPos=f32(d["lightPos"]),
        lightColor=f32(d["lightColor"]),
        mat_albedo=f32([m["albedo"] for m in mats]),
        mat_r0=f32([m["r0"] for m in mats]),
        mat_smoothness=f32([m["smoothness"] for m in mats]),
    )


def render_from_blobs(opt_blobs, volume, mc_tables, accum=None, accel=True):
    """Replay the reference's exact per-pass inputs.

    opt_blobs: list of TRenderOpts byte blobs, one per pass (the reference
    allocates `iter` option buffers differing only in `time`,
    core.clj:99-106). mc_tables: (iter, tableLen, 4) float32 — inject the
    reference's host-generated tables for exact-parity runs.
    Returns (argb (H, W) uint32, accum).
    """
    from .ops import render as render_mod

    opts_list = [opts_from_blob(b) for b in opt_blobs]
    opts0 = opts_list[0]
    times = jnp.asarray([float(o.time) for o in opts_list], jnp.float32)
    mc_tables = jnp.asarray(mc_tables, jnp.float32)
    acc = None
    if accel:
        from .ops.accel import build_accel

        acc = build_accel(np.asarray(volume, np.uint8), opts0.voxelRes, opts0.isoVal)
    vol = jnp.asarray(volume, jnp.uint8).reshape(-1)
    return render_mod.render_image(
        vol, opts0, mc_tables, times=times, accum=accum, accel=acc
    )
