"""Generate the committed organic mesh asset: assets/trefoil.stl.

The reference's flagship gallery voxelizes Stanford bunny/dragon STLs
(README.org:49-56, meshvoxel.clj:25-69), but distributes no mesh files. This
deterministic generator produces a comparable kilovertex-scale organic
closed surface — a trefoil knot swept with an undulating tube radius —
so the voxelize -> render path runs against a real mesh: 18,000 grid
vertices / 36,000 triangles of binary STL (~1.8 MB).

Regenerate with: python scripts/make_mesh_asset.py [out.stl]
(byte-stable: pure numpy float32, no RNG).
"""

import struct
import sys

import numpy as np


def trefoil_tube(nt=300, nth=60, r0=0.55):
    """Vertex grid (nt, nth, 3) float32 on a trefoil-knot tube with an
    organically modulated radius, plus the quad connectivity implied by the
    grid (closed in both directions)."""
    t = np.linspace(0.0, 2.0 * np.pi, nt, endpoint=False, dtype=np.float64)
    # trefoil centerline
    cx = np.sin(t) + 2.0 * np.sin(2.0 * t)
    cy = np.cos(t) - 2.0 * np.cos(2.0 * t)
    cz = -np.sin(3.0 * t)
    c = np.stack([cx, cy, cz], axis=-1)  # (nt, 3)

    # frames: tangent + parallel-transported normal (avoids Frenet flips)
    dt_ = np.gradient(c, axis=0)
    tan = dt_ / np.linalg.norm(dt_, axis=1, keepdims=True)
    n = np.zeros_like(tan)
    ref = np.array([0.0, 0.0, 1.0])
    n0 = np.cross(tan[0], ref)
    n[0] = n0 / np.linalg.norm(n0)
    for i in range(1, nt):
        v = n[i - 1] - tan[i] * np.dot(tan[i], n[i - 1])
        n[i] = v / np.linalg.norm(v)
    b = np.cross(tan, n)

    th = np.linspace(0.0, 2.0 * np.pi, nth, endpoint=False, dtype=np.float64)
    # organic undulation: lobes along the knot + a twisting ridge
    rad = r0 * (
        1.0
        + 0.28 * np.sin(5.0 * t)[:, None]
        + 0.12 * np.sin(3.0 * th[None, :] + 2.0 * t[:, None])
    )
    ring = (
        np.cos(th)[None, :, None] * n[:, None, :]
        + np.sin(th)[None, :, None] * b[:, None, :]
    )
    verts = c[:, None, :] + rad[:, :, None] * ring  # (nt, nth, 3)
    return verts.astype(np.float32)


def grid_to_triangles(verts):
    """Closed (nt, nth, 3) grid -> (T, 3, 3) float32 triangle soup."""
    nt, nth, _ = verts.shape
    i = np.arange(nt)[:, None]
    j = np.arange(nth)[None, :]
    a = verts[i, j]
    bb = verts[(i + 1) % nt, j]
    cc = verts[(i + 1) % nt, (j + 1) % nth]
    d = verts[i, (j + 1) % nth]
    t1 = np.stack([a, bb, cc], axis=2).reshape(-1, 3, 3)
    t2 = np.stack([a, cc, d], axis=2).reshape(-1, 3, 3)
    return np.concatenate([t1, t2], axis=0).astype(np.float32)


def write_binary_stl(path, tris):
    """(T, 3, 3) float32 -> binary STL with unit facet normals."""
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    nrm = np.cross(e1, e2)
    ln = np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = (nrm / np.maximum(ln, 1e-20)).astype(np.float32)
    rec = np.zeros((tris.shape[0], 50), dtype=np.uint8)
    f = np.concatenate([nrm[:, None, :], tris], axis=1).reshape(-1, 12)
    rec[:, :48] = f.astype("<f4").view(np.uint8).reshape(-1, 48)
    with open(path, "wb") as fh:
        fh.write(b"raymarchcl_tpu trefoil asset".ljust(80, b"\0"))
        fh.write(struct.pack("<I", tris.shape[0]))
        fh.write(rec.tobytes())


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "assets/trefoil.stl"
    verts = trefoil_tube()
    tris = grid_to_triangles(verts)
    write_binary_stl(out, tris)
    print(f"{out}: {verts.shape[0] * verts.shape[1]} grid vertices, "
          f"{tris.shape[0]} triangles")
