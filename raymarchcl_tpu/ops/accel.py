"""Brick-table acceleration for the fixed-step march.

The reference brute-forces every voxel step through the volume with one
lookup per sample (renderer.cl:219-234). On this TPU, arbitrary gathers pay
a fixed per-ROW cost up to ~64-72 B of row width: gathering a 72-byte row
costs about the same as a single element (scripts/bench_row_gather.py,
v5e: ~18.8 M rows/s at 64 B vs ~9.1 M at 256 B). So the march's unit of
memory access is not a voxel but a BRICK: one gather stages an entire
8^3-voxel occupancy neighborhood, and the following probe steps against it
are pure vector ops.

Row layout — (NB, ROW_WORDS) uint32 per BRICK^3 brick (edge configurable
via set_brick(), default 8), brick id (bz*NBY + by)*NBX + bx, local bit
index L = ((lz*BRICK + ly)*BRICK + lx):

  words [0:DIST_W)  STOP bitplane (BRICK^3 bits): bit L set <=> the voxel
                    stops the march (value > isoVal), with out-of-grid
                    padding voxels set
  word DIST_W       brick-level Chebyshev distance D (in bricks, capped
                    255) to the nearest brick containing a STOP bit, with
                    outside-the-grid counting as stopping
  word DIST_W+1     zero padding (even word count)

Rows deliberately carry NO material information: random row gathers pay
roughly per-byte above 64 B on this platform (64 B rows gather ~2x faster
than the 256 B rows of an earlier layout that embedded a 2-bit material
plane), while the march needs a material only at its final hit voxel —
ONE element re-fetch of the volume per ray (march.py), exactly the
reference's value-at-hit semantics (renderer.cl:205-207, 226).

March contracts (proofs the marches rely on; asserted bit-for-bit against
the plain march in tests/test_accel.py):

* STOP bit at an in-bounds sample is EXACTLY the reference's hit test,
  and at any hit voxel (v > isoVal) voxelMaterial(vol[voxel]) is the
  reference's material band — fetched once per ray after the march.
* D >= 1 proves the brick holds no stopping voxel and is in-grid, so the
  landing sample itself is not a hit.
* D >= 2 proves every voxel within Chebyshev distance d_equiv - 1 of any
  voxel of this brick is in-bounds and not a hit, where
  d_equiv = 8*D - 7 (two voxels in bricks at brick-Chebyshev distance D
  are at voxel-Chebyshev >= 8*D - 7). This licenses skipping
  floor((d_equiv - SKIP_SLACK) / vps) samples exactly like the round-1
  per-voxel distance field, with the same truncation-slack argument.

Memory: 72 B per 8^3 brick = 0.14 byte/voxel (a 256^3 volume -> 2.3 MiB),
plus a 224 B/brick 12^3 occupancy window (`nrm_rows`) serving the whole
5^3 smooth-normal neighborhood with ONE row gather per ray
(ops/march._occ5_superbrick).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

_I32 = jnp.int32

BRICK = 8  # voxels per brick axis (power of two; switch via set_brick())
BRICK_SHIFT = 3  # log2(BRICK)
BRICK_MASK = 7  # BRICK - 1
STOP_W0 = 0
DIST_W = 16  # BRICK^3 / 32 STOP words precede the distance word
ROW_WORDS = 18  # DIST_W + distance word + pad to even
NRM_BRICK = 8  # smooth-normal window grid stride — FIXED (12^3 windows
#                cover [q-2, q+2]^3 for any q in an 8^3 cell), independent
#                of the march BRICK so set_brick() never touches normals
NRM_ROW_WORDS = 56  # 12^3 bits = 54 words, padded to even


def set_brick(n: int):
    """Switch the brick edge (4/8/16/32) for subsequent build_accel calls.
    BUILD-time only: the march decodes a table through Accel.edge (static
    pytree aux — retraces automatically), never through these globals, so
    existing tables stay valid at any later setting. The march contracts
    hold at any edge B with d_equiv = B*D - (B-1) (two voxels in bricks at
    brick-Chebyshev D are at voxel-Chebyshev >= B*D - (B-1)); per-sample
    semantics are edge-independent, so any edge is bit-equal to the plain
    march (tests/test_accel.py::test_brick_edge_bit_equal)."""
    global BRICK, BRICK_SHIFT, BRICK_MASK, DIST_W, ROW_WORDS
    assert n in (4, 8, 16, 32), n
    BRICK = n
    BRICK_SHIFT = n.bit_length() - 1
    BRICK_MASK = n - 1
    DIST_W = n**3 // 32
    ROW_WORDS = DIST_W + 2

# Tables at or below this row count also carry a byte-plane f32 copy so
# row gathers can run as one-hot matmuls ON THE MXU instead of XLA's
# scalar-loop gather emitter: gather cost is O(K * NB) MACs, a win for
# small-volume scenes (64^3 mesh grids -> 512 bricks). EXACT because every
# payload is a byte (integers <= 255 are bf16-exact, so the default
# single-pass bf16 MXU product against a 0/1 one-hot is exact) and each
# f32-accumulated row sum has exactly one nonzero term (march._mxu_rows).
#
# Cap measured both ways on v5e (scripts/bench_mxu_rows_ab.py): 512 rows
# (64^3 bunny) = 25% frame WIN; 4096 rows (128^3 scatter, config 4) = 21%
# frame LOSS (6.18 s one-hot vs 4.87 gather, bit-equal) — the MAC budget
# is linear in NB while the gather is ~flat, so the old 4096 cap sat past
# the crossover. 1024 keeps the measured win region with margin;
# 1024-2048 rows are untested either way.
ONEHOT_MAX_ROWS = 1024

# Safety slack subtracted from d_equiv before converting to skippable steps:
# voxel coords are trunc-toward-zero of f32 products, so a sample i steps
# ahead can land up to floor(i*vps)+2 voxels away per axis (truncation
# difference bound), and f32 position rounding adds <<1 voxel more. Proof
# obligation: i*vps + 2 + eps <= d_equiv - 1  =>  i <= (d_equiv - 3.5)/vps.
SKIP_SLACK = 3.5

# Bit-test probes resolved per staged brick row before the march re-gathers
# (march-side unroll depth). Round-2 serial sweep said 6; the round-4
# re-sweep under the pass-stacked wide engine moved the optimum to 8
# (headline 512^2/16spp ao: 6 -> 3.540 s, 8 -> 3.433, 12 -> 3.686,
# 16 -> 3.956, bit-equal). Reflective presets run DEEPER probes — see
# march.SUBSTEPS_REFLECTIVE (their secondary marches keep paying off
# through 16: config 4 6 -> 6.180 s, 8 -> 5.774, 12 -> 5.65, 16 -> 5.403).
BRICK_SUBSTEPS = 8


@struct.dataclass
class Accel:
    """Brick table + smooth-normal window bitplane (see module doc).

    rows:     (NB, 18) uint32 brick rows (march).
    nrm_rows: ((NBZ+2)*(NBY+2)*(NBX+2), 56) uint32 12^3 OCCUPANCY windows
              over the brick grid plus a 1-brick ring (ring windows serve
              neighborhoods straddling the boundary from outside), bit
              L = (wz*12 + wy)*12 + wx (little-endian within/across words)
              over window voxel (8*bx - 2 + wx, ...): bit set <=> v >=
              isoVal (voxelLookupI, renderer.cl:172-178), out-of-grid and
              padding voxels clear. Any voxel q of brick b has its whole
              [q-2, q+2]^3 smooth-normal neighborhood inside b's window,
              so ONE row gather serves all 125 occupancy bits
              (ops/march._occ5_superbrick) instead of 125 element gathers
              (or the 8 smaller row gathers of the earlier layout).
    """

    rows: jnp.ndarray
    nrm_rows: jnp.ndarray
    # byte-plane f32 copies for MXU one-hot gathers (None above
    # ONEHOT_MAX_ROWS): (NB, 4*ROW_WORDS) and (NBW, 4*NRM_ROW_WORDS),
    # column 4*w + b = byte b of word w
    rows_mxu: jnp.ndarray | None = None
    nrm_mxu: jnp.ndarray | None = None
    # Brick edge the table was BUILT at. Static pytree aux: the march
    # decodes rows through this (never through the module globals, which
    # only steer builds), so a table can never be mis-decoded by a later
    # set_brick; being aux data it also hashes into the jit key, so edge
    # flips retrace automatically.
    edge: int = struct.field(pytree_node=False, default=8)


def brick_dims(voxel_res, edge=None):
    """(NBX, NBY, NBZ) brick-grid dims for a voxel resolution at the given
    (default: currently configured) brick edge."""
    b = BRICK if edge is None else edge
    rx, ry, rz = int(voxel_res[0]), int(voxel_res[1]), int(voxel_res[2])
    return -(-rx // b), -(-ry // b), -(-rz // b)


def nrm_dims(voxel_res):
    """(NNX, NNY, NNZ) smooth-normal window-grid dims (fixed 8-stride)."""
    rx, ry, rz = int(voxel_res[0]), int(voxel_res[1]), int(voxel_res[2])
    return -(-rx // NRM_BRICK), -(-ry // NRM_BRICK), -(-rz // NRM_BRICK)


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
    """(Z, Y, X) padded array -> (NB, BRICK^3) with local index
    L = ((lz*BRICK + ly)*BRICK + lx)."""
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

    # pad to brick multiples: stop=1 (outside grid)
    stop = np.ones((nbz * BRICK, nby * BRICK, nbx * BRICK), bool)
    stop[:rz, :ry, :rx] = v > iso_val

    sb = _brickify(stop, nbx, nby, nbz)  # (NB, BRICK^3) bool
    occw = (
        np.packbits(sb, axis=1, bitorder="little")
        .view("<u4")
        .astype(np.uint32)
    )  # (NB, DIST_W)

    brick_stop = sb.any(axis=1).reshape(nbz, nby, nbx)
    dist = chebyshev_from_mask(brick_stop).reshape(-1).astype(np.uint32)

    nb = sb.shape[0]
    rows = np.zeros((nb, ROW_WORDS), np.uint32)
    rows[:, STOP_W0:DIST_W] = occw
    rows[:, DIST_W] = dist

    # 12^3 occupancy windows at NRM_BRICK(=8) stride over an EXPANDED
    # (+1-cell-ring) grid (see Accel.nrm_rows): ring windows serve
    # neighborhoods of out-of-grid voxel coords that straddle back into
    # the grid. Pad the 8-multiple grid by 10 zero voxels per side
    # (ring cell origin 8*(-1) - 2 = -10; out-of-grid occupancy is 0),
    # slide a 12^3 window at stride 8. The window grid is independent of
    # the march BRICK (set_brick never changes normals).
    nnx, nny, nnz = nrm_dims(voxel_res)
    gep = np.zeros(
        (nnz * NRM_BRICK + 20, nny * NRM_BRICK + 20, nnx * NRM_BRICK + 20),
        bool,
    )
    gep[10 : 10 + rz, 10 : 10 + ry, 10 : 10 + rx] = v >= iso_val
    win = np.lib.stride_tricks.sliding_window_view(gep, (12, 12, 12))[
        ::NRM_BRICK, ::NRM_BRICK, ::NRM_BRICK
    ].reshape((nnz + 2) * (nny + 2) * (nnx + 2), 12 * 12 * 12)
    nrm = np.zeros((win.shape[0], NRM_ROW_WORDS * 4), np.uint8)
    nrm[:, : (12 ** 3 + 7) // 8] = np.packbits(win, axis=1, bitorder="little")
    nrm = nrm.view("<u4").astype(np.uint32)

    def byte_planes(t):
        # (R, W) u32 -> (R, 4W) f32 little-endian byte planes (all values
        # <= 255: bf16-exact, see ONEHOT_MAX_ROWS)
        return jnp.asarray(
            t.astype("<u4").view(np.uint8).astype(np.float32)
        )

    # MXU one-hot gate: cap the onehot matmul's MAC budget at the tuned
    # 8^3 point (4096 rows x 18 words); wider rows (set_brick) shrink the
    # allowed table proportionally
    rows_mxu = (
        byte_planes(rows) if nb * ROW_WORDS <= ONEHOT_MAX_ROWS * 18 else None
    )
    nrm_mxu = byte_planes(nrm) if nrm.shape[0] <= ONEHOT_MAX_ROWS else None
    return Accel(
        rows=jnp.asarray(rows), nrm_rows=jnp.asarray(nrm),
        rows_mxu=rows_mxu, nrm_mxu=nrm_mxu, edge=BRICK,
    )


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
