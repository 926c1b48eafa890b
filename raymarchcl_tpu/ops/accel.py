"""Brick-table acceleration for the fixed-step march.

The reference brute-forces every voxel step through the volume with one
lookup per sample (renderer.cl:219-234). On this TPU, arbitrary gathers pay
a fixed per-ROW cost, nearly independent of row width: gathering a 256-byte
row costs ~1.6x a single element (scripts/bench_row_gather.py, v5e). So the
march's unit of memory access is not a voxel but a BRICK: one gather stages
an entire 8^3-voxel neighborhood, and the following probe steps against it
are pure vector ops.

Row layout — (NB, 64) uint32 per 8^3 brick, brick id (bz*NBY + by)*NBX + bx,
local bit index L = ((lz*8 + ly)*8 + lx):

  words [0:16)   STOP bitplane: bit L set <=> the voxel stops the march
                 (value > isoVal), with out-of-grid padding voxels set
  words [16:48)  2-bit CODE plane at word 16+(L>>4), shift 2*(L&15):
                 0 when v < isoVal, else the material band of v
                 (renderer.cl:205-207: v<84 -> 1, v<168 -> 2, else 3).
                 code != 0 is exactly voxelLookupI occupancy (v >= isoVal),
                 and at any hit voxel (v > isoVal) code == voxelMaterial(v)
  word 48        brick-level Chebyshev distance D (in bricks, capped 255)
                 to the nearest brick containing a STOP bit, with
                 outside-the-grid counting as stopping
  words [49:64)  zero padding (alignment headroom)

March contracts (proofs the marches rely on; asserted bit-for-bit against
the plain march in tests/test_accel.py):

* STOP bit at an in-bounds sample is EXACTLY the reference's hit test.
* D >= 1 proves the brick holds no stopping voxel and is in-grid, so the
  landing sample itself is not a hit.
* D >= 2 proves every voxel within Chebyshev distance d_equiv - 1 of any
  voxel of this brick is in-bounds and not a hit, where
  d_equiv = 8*D - 7 (two voxels in bricks at brick-Chebyshev distance D
  are at voxel-Chebyshev >= 8*D - 7). This licenses skipping
  floor((d_equiv - SKIP_SLACK) / vps) samples exactly like the round-1
  per-voxel distance field, with the same truncation-slack argument.

Memory: 256 B per 8^3 brick = 0.5 byte/voxel (a 256^3 volume -> 8 MiB),
plus a 64 B/brick occupancy bitplane (`ge_rows`) serving the smooth-normal
neighborhood (ops/march._occ5_bricks).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

_I32 = jnp.int32

BRICK = 8  # voxels per brick axis
ROW_WORDS = 64
STOP_W0, CODE_W0, DIST_W = 0, 16, 48

# Safety slack subtracted from d_equiv before converting to skippable steps:
# voxel coords are trunc-toward-zero of f32 products, so a sample i steps
# ahead can land up to floor(i*vps)+2 voxels away per axis (truncation
# difference bound), and f32 position rounding adds <<1 voxel more. Proof
# obligation: i*vps + 2 + eps <= d_equiv - 1  =>  i <= (d_equiv - 3.5)/vps.
SKIP_SLACK = 3.5

# Bit-test probes resolved per staged brick row before the march re-gathers
# (march-side unroll depth; v5e sweep optimum: 6 beats 2/4/5/8 at 256^2 ao).
BRICK_SUBSTEPS = 6


@struct.dataclass
class Accel:
    """Brick table + occupancy bitplane (see module doc).

    rows:    (NB, 64) uint32 brick rows (march).
    ge_rows: (NB, 16) uint32 per-brick OCCUPANCY bitplane at the same local
             bit indexing: bit L set <=> v >= isoVal (voxelLookupI,
             renderer.cl:172-178), padding voxels clear. Serves the 5^3
             smooth-normal neighborhood with 8 row gathers per ray
             (ops/march._occ5_bricks) instead of 125 element gathers.
    """

    rows: jnp.ndarray
    ge_rows: jnp.ndarray


def brick_dims(voxel_res):
    """(NBX, NBY, NBZ) brick-grid dims for a voxel resolution."""
    rx, ry, rz = int(voxel_res[0]), int(voxel_res[1]), int(voxel_res[2])
    return -(-rx // BRICK), -(-ry // BRICK), -(-rz // BRICK)


def chebyshev_from_mask(stop_3d):
    """Exact Chebyshev distance to {mask} U {outside}, capped at 255.

    stop_3d: (Z, Y, X) bool ndarray of stopping cells. The outside of the
    array counts as stopping (a zero ring pads the transform), so a cell's
    distance never exceeds its distance to the boundary — marches licensed
    by it can never skip past their first out-of-bounds exit."""
    from scipy.ndimage import distance_transform_cdt

    z, y, x = stop_3d.shape
    freep = np.zeros((z + 2, y + 2, x + 2), dtype=np.uint8)
    freep[1:-1, 1:-1, 1:-1] = ~stop_3d
    d = distance_transform_cdt(freep, metric="chessboard")[1:-1, 1:-1, 1:-1]
    return np.minimum(d, 255).astype(np.uint8)


def _brickify(a3, nbx, nby, nbz):
    """(Z, Y, X) padded array -> (NB, 512) with local index L=(lz*8+ly)*8+lx."""
    return (
        a3.reshape(nbz, BRICK, nby, BRICK, nbx, BRICK)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(-1, BRICK**3)
    )


def build_accel(vol, voxel_res, iso_val) -> Accel:
    """Build the brick table (and normal words) on the host."""
    rx, ry, rz = int(voxel_res[0]), int(voxel_res[1]), int(voxel_res[2])
    nbx, nby, nbz = brick_dims(voxel_res)
    v = np.asarray(vol, np.uint8).reshape(rz, ry, rx)

    # pad to brick multiples: stop=1 (outside grid), code=0 (never read)
    stop = np.ones((nbz * BRICK, nby * BRICK, nbx * BRICK), bool)
    stop[:rz, :ry, :rx] = v > iso_val
    band = np.where(v < 84, 1, np.where(v < 168, 2, 3)).astype(np.uint8)
    code = np.zeros_like(stop, np.uint8)
    code[:rz, :ry, :rx] = np.where(v >= iso_val, band, 0)

    sb = _brickify(stop, nbx, nby, nbz)  # (NB, 512) bool
    occw = (
        np.packbits(sb, axis=1, bitorder="little")
        .view("<u4")
        .astype(np.uint32)
    )  # (NB, 16)
    cb = _brickify(code, nbx, nby, nbz).astype(np.uint32)  # (NB, 512)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, None, :]
    codew = np.bitwise_or.reduce(cb.reshape(-1, 32, 16) << shifts, axis=2)

    brick_stop = sb.any(axis=1).reshape(nbz, nby, nbx)
    dist = chebyshev_from_mask(brick_stop).reshape(-1).astype(np.uint32)

    nb = sb.shape[0]
    rows = np.zeros((nb, ROW_WORDS), np.uint32)
    rows[:, STOP_W0:CODE_W0] = occw
    rows[:, CODE_W0:DIST_W] = codew
    rows[:, DIST_W] = dist

    ge = np.zeros(stop.shape, bool)
    ge[:rz, :ry, :rx] = v >= iso_val
    gew = (
        np.packbits(_brickify(ge, nbx, nby, nbz), axis=1, bitorder="little")
        .view("<u4")
        .astype(np.uint32)
    )
    return Accel(rows=jnp.asarray(rows), ge_rows=jnp.asarray(gew))


def skips_per_distance(opts, delta):
    """Per-ray multiplier turning a proven voxel-Chebyshev clearance d into
    a safe skip count: skip = floor((d - SKIP_SLACK) * inv_vps). delta: V3
    of (N,) normalized-space step vectors; vps = max-axis voxels per step.

    Degenerate rays (vps == 0 => the sample never moves) get a huge
    multiplier: any d > SKIP_SLACK proves EVERY later sample identical and
    non-stopping, so jumping straight past the budget is exact (the
    reference would burn its whole budget re-sampling one free voxel and
    conclude no-hit, same outcome)."""
    rx, ry, rz, _ = opts.voxelRes
    vps = jnp.maximum(
        jnp.abs(delta.x) * rx, jnp.maximum(jnp.abs(delta.y) * ry, jnp.abs(delta.z) * rz)
    )
    return jnp.where(vps > 0, 1.0 / jnp.maximum(vps, 1e-30), 1e30)
