"""Empty-space-skipping acceleration structure for the fixed-step march.

The reference brute-forces every voxel step through empty space
(renderer.cl:219-234). Because the march is FIXED-STEP, a sample can be
skipped whenever it is provably (a) inside the volume and (b) not a hit —
so skipping changes NOTHING about the output (asserted bit-for-bit in
tests/test_accel.py).

Structure: a coarse block grid (default 32^3 voxels per block) storing
"this block or any neighbor contains a voxel > isoVal" — i.e. occupancy
DILATED by one block, with everything outside the volume treated as
occupied. A ray sampling inside an empty dilated block can jump
floor((B-1)/max_axis_voxels_per_step) steps without evaluating them: every
skipped sample lies within Chebyshev distance B-1 of the probe, which the
dilation guarantees is in-volume and below the iso threshold. Boundary
blocks are always "occupied", so the exact first-out-of-bounds break of the
reference march is preserved.

The mip for a 512^3 volume at B=32 is 4 KB — it lives happily in cache/VMEM
while the 134 MB volume stays in HBM; probe gathers are nearly free.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

_I32 = jnp.int32


@struct.dataclass
class Accel:
    """Dilated block-occupancy mip. `mip` is flat uint8, index
    bz*(bxn*byn) + by*bxn + bx; static meta makes it jit-cache stable."""

    mip: jnp.ndarray
    block_log2: int = struct.field(pytree_node=False)
    dims: Tuple[int, int, int] = struct.field(pytree_node=False)  # (bxn, byn, bzn)


def build_accel(vol, voxel_res, iso_val, block_log2=5) -> Accel:
    """Build the dilated occupancy mip on the host (numpy)."""
    rx, ry, rz = voxel_res[0], voxel_res[1], voxel_res[2]
    b = 1 << block_log2
    v = np.asarray(vol, np.uint8).reshape(rz, ry, rx)
    bxn, byn, bzn = -(-rx // b), -(-ry // b), -(-rz // b)
    vp = np.zeros((bzn * b, byn * b, bxn * b), np.uint8)
    vp[:rz, :ry, :rx] = v
    occ = (
        vp.reshape(bzn, b, byn, b, bxn, b).max(axis=(1, 3, 5)) > iso_val
    ).astype(np.uint8)
    # dilate by one block, outside-volume = occupied
    occ_p = np.pad(occ, 1, constant_values=1)
    dil = np.zeros_like(occ)
    for dz in (0, 1, 2):
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                np.maximum(
                    dil, occ_p[dz : dz + bzn, dy : dy + byn, dx : dx + bxn], out=dil
                )
    return Accel(
        mip=jnp.asarray(dil.reshape(-1)),
        block_log2=int(block_log2),
        dims=(int(bxn), int(byn), int(bzn)),
    )


def probe_empty(accel: Accel, opts, px, py, pz, active):
    """True for rays whose current sample sits in an empty dilated block
    (strictly inside the volume). p* are normalized [0,1) positions (N,)."""
    rx, ry, rz, _ = opts.voxelRes
    vx = (px * rx).astype(_I32)
    vy = (py * ry).astype(_I32)
    vz = (pz * rz).astype(_I32)
    inb = (
        (px >= 0) & (vx < rx) & (py >= 0) & (vy < ry) & (pz >= 0) & (vz < rz)
    )
    bl = accel.block_log2
    bxn, byn, _ = accel.dims
    bidx = (vz >> bl) * (bxn * byn) + (vy >> bl) * bxn + (vx >> bl)
    mip = jnp.take(accel.mip, jnp.where(inb, bidx, 0), mode="clip")
    return active & inb & (mip == 0)


def skip_steps(accel: Accel, opts, delta):
    """Per-ray step count safely skippable inside an empty dilated block:
    floor((B-1) / max_axis |delta*res|) (0 disables skipping for that ray)."""
    rx, ry, rz, _ = opts.voxelRes
    b = 1 << accel.block_log2
    dv = jnp.maximum(
        jnp.abs(delta.x) * rx, jnp.maximum(jnp.abs(delta.y) * ry, jnp.abs(delta.z) * rz)
    )
    return jnp.where(dv > 0, ((b - 1) / jnp.maximum(dv, 1e-20)), 0.0).astype(_I32)
