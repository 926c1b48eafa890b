"""Pallas TPU kernel for the fixed-step volume march with the voxel volume
resident in VMEM.

For volumes that fit on-chip (<= ~12 MB: up to ~224^3 uint8, always true
for BASELINE config-3 style mesh grids), the march's random-access byte
gathers hit VMEM instead of HBM. The kernel runs the same chunked
first-hit/first-exit resolution as ops.march.march_volume (semantics
identical; asserted in tests) over a grid of ray tiles, with the whole
volume broadcast to every program.

Status: CORRECT in interpreter mode (tests/test_pallas.py) but NOT
compilable by Mosaic on current hardware: TPU `tpu.dynamic_gather` only
supports 2D operands with one position-fixed axis (out[i,j] = x[idx,j] or
x[i,idx]), so an arbitrary flat-index gather from a VMEM volume has no
lowering (verified on v5e, jax 0.9: "Only 2D gather is supported"). A
lane-replicated (8, SIZE) layout would lift volumes <= ~2MB only. Kept as
the reference implementation for when Mosaic grows arbitrary gathers;
see PERFORMANCE.md for the measured XLA gather wall this would address.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vecmath import V3

_TILE = 2048  # rays per program
_LANES = 128


def _march_kernel(
    vol_ref, p0x, p0y, p0z, dx, dy, dz, act_ref, hit_ref, hitk_ref,
    *, steps, chunk, iso, rx, ry, rz, rxy,
):
    vol = vol_ref[:]
    ks = jax.lax.broadcasted_iota(jnp.float32, (chunk, _TILE), 0)
    ksi = jax.lax.broadcasted_iota(jnp.int32, (chunk, _TILE), 0)
    n_rounds = -(-steps // chunk)

    def body(i, carry):
        act, hit, hit_k = carry
        base = (i * chunk).astype(jnp.float32)
        px = p0x[:][None, :] + dx[:][None, :] * (base + ks)
        py = p0y[:][None, :] + dy[:][None, :] * (base + ks)
        pz = p0z[:][None, :] + dz[:][None, :] * (base + ks)
        qx = (px * rx).astype(jnp.int32)
        qy = (py * ry).astype(jnp.int32)
        qz = (pz * rz).astype(jnp.int32)
        valid = (
            (qx >= 0) & (qx < rx) & (qy >= 0) & (qy < ry) & (qz >= 0) & (qz < rz)
        )
        idx = jnp.where(valid, qz * rxy + qy * rx + qx, 0)
        v = jnp.take(vol, idx.reshape(-1), mode="clip").reshape(chunk, _TILE)
        v = jnp.where(valid, v.astype(jnp.int32), -1)
        valid_k = (i * chunk + ksi) < steps
        oob = (v < 0) & valid_k
        hitm = (v > iso) & valid_k
        any_oob = jnp.any(oob, axis=0)
        any_hit = jnp.any(hitm, axis=0)
        first_oob = jnp.argmax(oob, axis=0)
        first_hit = jnp.argmax(hitm, axis=0)
        is_hit = any_hit & (~any_oob | (first_hit < first_oob))
        first = jnp.where(is_hit, first_hit, first_oob)
        any_stop = any_oob | any_hit
        newly = act & any_stop
        return (
            act & ~any_stop,
            jnp.where(newly, is_hit, hit),
            jnp.where(newly, i * chunk + first, hit_k),
        )

    act0 = act_ref[:] != 0
    hit0 = jnp.zeros((_TILE,), bool)
    hitk0 = jnp.zeros((_TILE,), jnp.int32)
    act, hit, hit_k = jax.lax.fori_loop(0, n_rounds, body, (act0, hit0, hitk0))
    hit_ref[:] = hit.astype(jnp.int32)
    hitk_ref[:] = hit_k


def march_volume_pallas(vol, opts, p0: V3, delta: V3, steps, active,
                        chunk=16, interpret=False):
    """VMEM-resident march; same contract as ops.march.march_volume
    (returns hit (N,) bool, hit_k (N,) int32)."""
    rx, ry, rz, rxy = opts.voxelRes
    n = p0.x.shape[0]
    n_pad = -(-n // _TILE) * _TILE

    def pad(x, fill=0.0, dt=jnp.float32):
        return jnp.full((n_pad,), fill, dt).at[:n].set(x)

    args = (
        vol,
        pad(p0.x, 2.0), pad(p0.y, 2.0), pad(p0.z, 2.0),
        pad(delta.x), pad(delta.y), pad(delta.z),
        pad(active.astype(jnp.int32), 0, jnp.int32),
    )
    ray_spec = pl.BlockSpec((_TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
    kern = functools.partial(
        _march_kernel,
        steps=int(steps), chunk=int(chunk), iso=int(opts.isoVal),
        rx=rx, ry=ry, rz=rz, rxy=rxy,
    )
    hit, hit_k = pl.pallas_call(
        kern,
        grid=(n_pad // _TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        ),
        interpret=interpret,
    )(*args)
    return hit[:n] != 0, hit_k[:n]


def pallas_march_enabled():
    return os.environ.get("RAYMARCHCL_TPU_PALLAS_MARCH", "0") == "1"


def fits_vmem(voxel_res, budget_bytes=12 << 20):
    rx, ry, rz, _ = voxel_res
    return rx * ry * rz <= budget_bytes
