"""Render options: the single flat config that drives the whole renderer.

This is the TPU-native equivalent of the reference's `TRenderOpts` device
struct (reference: resources/renderer.cl:35-78) plus the `render-options`
builder that fills it from sparse user kwargs (reference: core.clj:28-74).

Design: one frozen flax dataclass. Fields that participate in traced compute
are float32/int arrays (pytree leaves, so animation / per-pass updates do NOT
retrace); fields that determine shapes or loop trip counts are static
(`pytree_node=False`, so they hash into the jit cache key): resolution,
voxelRes, the iteration budgets, numLights, isoVal.

Field-for-field parity with TRenderOpts; the `materials[4]` array-of-struct
becomes struct-of-arrays (mat_albedo/mat_r0/mat_smoothness) which is the
natural vectorized layout.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from .materials import get_preset

MC_TABLE_LENGTH = 0x4000  # reference: core.clj:138 (16384 float4 samples)


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


@struct.dataclass
class RenderOpts:
    """TRenderOpts parity pytree (reference: renderer.cl:35-78).

    Static fields control shapes / unrolled loop bounds; dynamic fields are
    float32 leaves safe to swap per frame or per spp pass without retracing.
    """

    # --- static configuration (hashed into the jit key) ---
    resolution: Tuple[int, int] = struct.field(pytree_node=False)  # (w, h)
    voxelRes: Tuple[int, int, int, int] = struct.field(pytree_node=False)  # (rx,ry,rz,rx*ry)
    maxIter: int = struct.field(pytree_node=False)
    maxVoxelIter: int = struct.field(pytree_node=False)
    shadowIter: int = struct.field(pytree_node=False)
    aoIter: int = struct.field(pytree_node=False)
    reflectIter: int = struct.field(pytree_node=False)
    numLights: int = struct.field(pytree_node=False)
    isoVal: int = struct.field(pytree_node=False)
    mcTableLength: int = struct.field(pytree_node=False)
    # structural geometry constants (never animated; folding them into the
    # compiled program as immediates keeps tiny-vector broadcasts out of the
    # hot loops): voxel box bounds and the volume-space scale
    voxelBounds: Tuple[float, float, float] = struct.field(pytree_node=False)
    voxelBounds2: Tuple[float, float, float] = struct.field(pytree_node=False)
    voxelBoundsMin: Tuple[float, float, float] = struct.field(pytree_node=False)
    voxelBoundsMax: Tuple[float, float, float] = struct.field(pytree_node=False)
    invVoxelScale: Tuple[float, float, float] = struct.field(pytree_node=False)
    # scene constants used to derive static march-truncation bounds
    aoStepDist: float = struct.field(pytree_node=False)
    voxelSize: float = struct.field(pytree_node=False)

    # --- dynamic parameters (float32 pytree leaves) ---
    eyePos: jnp.ndarray  # (3,)
    targetPos: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    skyColor1: jnp.ndarray  # (3,)
    skyColor2: jnp.ndarray  # (3,)
    invAspect: jnp.ndarray  # ()
    time: jnp.ndarray  # ()
    fov: jnp.ndarray  # ()
    maxDist: jnp.ndarray  # ()
    startDist: jnp.ndarray  # ()
    eps: jnp.ndarray  # ()
    aoAmp: jnp.ndarray  # ()
    groundY: jnp.ndarray  # ()
    shadowBias: jnp.ndarray  # ()
    lightScatter: jnp.ndarray  # ()
    minLightAtt: jnp.ndarray  # ()
    gamma: jnp.ndarray  # ()
    exposure: jnp.ndarray  # ()
    dof: jnp.ndarray  # ()
    frameBlend: jnp.ndarray  # ()
    fogPow: jnp.ndarray  # ()
    flareAmp: jnp.ndarray  # ()
    lightPos: jnp.ndarray  # (4, 4)
    lightColor: jnp.ndarray  # (4, 4)
    mat_albedo: jnp.ndarray  # (4, 4) -- TRenderOpts.materials[i].albedo
    mat_r0: jnp.ndarray  # (4,)   -- TRenderOpts.materials[i].r0
    mat_smoothness: jnp.ndarray  # (4,)   -- TRenderOpts.materials[i].smoothness

    @property
    def width(self) -> int:
        return self.resolution[0]

    @property
    def height(self) -> int:
        return self.resolution[1]

    @property
    def num_pixels(self) -> int:
        return self.resolution[0] * self.resolution[1]


def _pad4x4(rows, n=4):
    """Pad a list of <=4 vectors of length <=4 to a (4,4) float32 array."""
    out = np.zeros((n, 4), dtype=np.float32)
    for i, r in enumerate(rows[:n]):
        r = list(r)
        out[i, : len(r)] = r
    return out


def render_options(
    width=640,
    height=360,
    vres=256,
    t=0.0,
    iter=1,
    eyepos=None,
    mat=None,
    fov=None,
    dof=None,
    targetpos=None,
    gamma=None,
    groundY=None,
    voxelSize=None,
    **overrides,
) -> RenderOpts:
    """Build the full option set from sparse kwargs.

    Defaults and derived fields replicate the reference exactly
    (core.clj:28-74): eps=0.005, clip=0.99, frameBlend=1/iter,
    fov deg->rad, invAspect=h/w, voxelRes=[rx,ry,rz,rx*ry], voxelSize=1/rx,
    then the material preset merged on top (preset wins, unknown preset ->
    `ao`, core.clj:74).

    `overrides` is an extension over the reference: any RenderOpts field can
    be forced (applied after the preset merge).
    """
    if isinstance(vres, (int, np.integer)):
        vres = [int(vres)] * 3  # core.clj:32
    vres = [int(v) for v in vres]
    eps = 0.005  # core.clj:30
    clip = 0.99  # core.clj:31

    preset = get_preset(mat)

    d = {
        "aoAmp": 0.2,
        "aoIter": 5,
        "aoStepDist": 0.05,
        "dof": dof if dof is not None else 0.001,
        "eps": eps,
        "exposure": 3.5,
        "eyePos": eyepos if eyepos is not None else [2, 0, 2],
        "flareAmp": 0.015,
        "fogPow": 0.05,
        "fov": math.radians(fov if fov is not None else 90),  # core.clj:43
        "frameBlend": 1.0 / iter,  # core.clj:44
        "gamma": gamma if gamma is not None else 1.5,
        "groundY": groundY if groundY is not None else 1.05,
        "invAspect": float(height) / float(width),  # core.clj:47
        "invVoxelScale": [0.5, 0.5, 0.5],
        "isoVal": 32,
        "lightColor": [[50, 50, 50, 0]],
        "lightPos": [[-2, 0, -2, 0], [2, 0, 2, 0]],
        "lightScatter": 0.2,
        "maxDist": 30,
        "maxIter": 128,
        "maxVoxelIter": 192,
        "minLightAtt": 0.0,
        "numLights": 2,
        "reflectIter": 0,
        "resolution": (int(width), int(height)),
        "shadowBias": 0.1,
        "shadowIter": 128,
        "skyColor1": [1.8, 1.8, 1.9],
        "skyColor2": [0.1, 0.1, 0.1],
        "startDist": 0.0,
        "targetPos": targetpos if targetpos is not None else [0, -0.15, 0],
        "time": t,
        "up": [0, 1, 0],
        "voxelBounds": [1, 1, 1],
        "voxelBounds2": [2, 2, 2],
        "voxelBoundsMax": [clip, clip, clip],
        "voxelBoundsMin": [-clip, -clip, -clip],
        "voxelRes": (vres[0], vres[1], vres[2], vres[0] * vres[1]),  # core.clj:72
        "voxelSize": voxelSize if voxelSize is not None else 1.0 / vres[0],  # core.clj:73
        "materials": None,
    }
    # Preset merge (preset wins over defaults, core.clj:33/74).
    d.update(preset)
    d.update(overrides)

    mats = d.pop("materials")
    mat_albedo = _pad4x4([m["albedo"] for m in mats])
    mat_r0 = np.asarray([m["r0"] for m in mats], dtype=np.float32)
    mat_smoothness = np.asarray([m["smoothness"] for m in mats], dtype=np.float32)

    return RenderOpts(
        resolution=tuple(d["resolution"]),
        voxelRes=tuple(d["voxelRes"]),
        maxIter=int(d["maxIter"]),
        maxVoxelIter=int(d["maxVoxelIter"]),
        shadowIter=int(d["shadowIter"]),
        aoIter=int(d["aoIter"]),
        reflectIter=int(d["reflectIter"]),
        numLights=int(d["numLights"]),
        isoVal=int(d["isoVal"]),
        mcTableLength=MC_TABLE_LENGTH,
        voxelBounds=tuple(float(v) for v in d["voxelBounds"]),
        voxelBounds2=tuple(float(v) for v in d["voxelBounds2"]),
        voxelBoundsMin=tuple(float(v) for v in d["voxelBoundsMin"]),
        voxelBoundsMax=tuple(float(v) for v in d["voxelBoundsMax"]),
        invVoxelScale=tuple(float(v) for v in d["invVoxelScale"]),
        aoStepDist=float(d["aoStepDist"]),
        voxelSize=float(d["voxelSize"]),
        eyePos=_f32(d["eyePos"]),
        targetPos=_f32(d["targetPos"]),
        up=_f32(d["up"]),
        skyColor1=_f32(d["skyColor1"]),
        skyColor2=_f32(d["skyColor2"]),
        invAspect=_f32(d["invAspect"]),
        time=_f32(d["time"]),
        fov=_f32(d["fov"]),
        maxDist=_f32(d["maxDist"]),
        startDist=_f32(d["startDist"]),
        eps=_f32(d["eps"]),
        aoAmp=_f32(d["aoAmp"]),
        groundY=_f32(d["groundY"]),
        shadowBias=_f32(d["shadowBias"]),
        lightScatter=_f32(d["lightScatter"]),
        minLightAtt=_f32(d["minLightAtt"]),
        gamma=_f32(d["gamma"]),
        exposure=_f32(d["exposure"]),
        dof=_f32(d["dof"]),
        frameBlend=_f32(d["frameBlend"]),
        fogPow=_f32(d["fogPow"]),
        flareAmp=_f32(d["flareAmp"]),
        lightPos=_f32(_pad4x4(d["lightPos"])),
        lightColor=_f32(_pad4x4(d["lightColor"])),
        mat_albedo=_f32(mat_albedo),
        mat_r0=_f32(mat_r0),
        mat_smoothness=_f32(mat_smoothness),
    )
