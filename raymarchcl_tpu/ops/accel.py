"""Distance-field empty-space skipping for the fixed-step march.

The reference brute-forces every voxel step through empty space
(renderer.cl:219-234). Because the march is FIXED-STEP, a sample can be
skipped whenever it is provably (a) inside the volume and (b) not a hit —
so skipping changes NOTHING about the output (asserted bit-for-bit in
tests/test_accel.py).

Structure: a per-voxel uint8 CHEBYSHEV DISTANCE field `dist`, same flat
indexing as the volume, where dist[q] = L-inf distance (in voxels) from q to
the nearest voxel of the STOPPING SET = {v > isoVal} U {outside the grid},
capped at 255. Properties the march exploits:

* dist[q] == 0  <=>  q itself stops the march (it is a hit — q being
  addressable means it is in-bounds, so the only stopping cause is v>iso).
* dist[q] = d > 0 proves every voxel within Chebyshev distance d-1 of q is
  in-bounds AND not a hit.

So ONE gather of `dist` at the current sample replaces the occupancy gather
(d==0 is exactly the hit test) and additionally licenses skipping
floor((d - SKIP_SLACK) / vps) subsequent samples, where vps is the march
step length in Chebyshev voxel units. On the gather-throughput-bound TPU
(~10 ns/element regardless of gather size — scripts/bench_gather_overhead)
march cost becomes proportional to LANDINGS instead of fixed-step samples.

Unlike the round-1 single-level dilated block mip, a distance field degrades
gracefully on dense-shell volumes (the 512^3 gyroid): near-surface probes
simply skip 0 and the march proceeds at reference pace, while every
free-space span is crossed in O(span/d) landings.

Memory: 1 byte/voxel (a 512^3 field is 134 MB — same as the volume; both
live in HBM).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

_I32 = jnp.int32

# Safety slack subtracted from d before converting to skippable steps: the
# voxel coord is trunc-toward-zero of a float product, so a sample i steps
# ahead can land up to floor(i*vps)+2 voxels away per axis (trunc difference
# bound), and the f32 position/product rounding adds <<1 voxel more. Proof
# obligation: i*vps + 2 + eps <= d - 1  =>  i <= (d - 3 - eps)/vps.
SKIP_SLACK = 3.5


@struct.dataclass
class Accel:
    """Per-voxel Chebyshev distance-to-stopping-set field (see module doc).

    `packed` is flat uint16 with the volume's indexing z*(rx*ry) + y*rx + x:
    dist | (voxel_value << 8) — ONE gather yields both the stopping test
    (low byte == 0) and the hit voxel's value (high byte), so the marches
    need no second value fetch (gather cost is per-ELEMENT,
    dtype-independent, so u16 is free).

    `words` is the raw volume packed 4 voxels per uint32 along x (byte i of
    word j = voxel 4j+i), or None when rx % 4 != 0. The 5^3 smooth-normal
    neighborhood reads 2 words per (y, z) row instead of 5 bytes — 50
    gathered elements instead of 125 (ops/march.voxel_normal_smooth).
    """

    packed: jnp.ndarray
    words: jnp.ndarray | None = None


def chebyshev_distance_field(vol, voxel_res, iso_val, cap=255):
    """Exact L-inf distance to {v > iso_val} U {outside}, capped. numpy in,
    numpy uint8 out (flat)."""
    from scipy.ndimage import distance_transform_cdt

    rx, ry, rz = int(voxel_res[0]), int(voxel_res[1]), int(voxel_res[2])
    v = np.asarray(vol, np.uint8).reshape(rz, ry, rx)
    # distance_transform_cdt: distance from nonzero cells to the nearest
    # ZERO cell. Input = free-mask padded with a zero (stopping) ring, so
    # the boundary counts as stopping-set at distance 1 from edge voxels.
    freep = np.zeros((rz + 2, ry + 2, rx + 2), dtype=np.uint8)
    freep[1:-1, 1:-1, 1:-1] = v <= iso_val
    d = distance_transform_cdt(freep, metric="chessboard")
    d = d[1:-1, 1:-1, 1:-1]
    return np.minimum(d, cap).astype(np.uint8).reshape(-1)


def build_accel(vol, voxel_res, iso_val) -> Accel:
    """Build the distance-field accel on the host."""
    d = chebyshev_distance_field(vol, voxel_res, iso_val)
    v = np.asarray(vol, np.uint8).reshape(-1)
    packed = d.astype(np.uint16) | (v.astype(np.uint16) << 8)
    words = None
    if voxel_res[0] % 4 == 0:
        # little-endian u32 view: byte i of word j = voxel 4j+i
        words = jnp.asarray(np.ascontiguousarray(v).view("<u4"))
    return Accel(packed=jnp.asarray(packed), words=words)


def skips_per_distance(opts, delta):
    """Per-ray multiplier turning a gathered distance d into a provably-safe
    skip count: skip = floor((d - SKIP_SLACK) * inv_vps). delta: V3 of (N,)
    normalized-space step vectors; vps = max-axis voxels per step.

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
