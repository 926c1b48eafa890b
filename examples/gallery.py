"""Render the showcase gallery (the reference's README gallery workflows,
reproduced with in-repo procedural assets since the original STL/volume
files aren't distributed).

Usage: python examples/gallery.py [outdir] [--size WxH] [--spp N]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def torus_knot_points(p=2, q=3, n=4000, tube=0.35, r=1.0):
    """Parametric (p,q) torus-knot point cloud (stand-in mesh vertices)."""
    t = np.linspace(0, 2 * np.pi, n)
    rr = r + np.cos(q * t) * 0.5
    x = rr * np.cos(p * t)
    y = np.sin(q * t) * 0.5
    z = rr * np.sin(p * t)
    pts = np.stack([x, y, z], 1)
    rng = np.random.default_rng(0)
    off = rng.normal(scale=tube * 0.25, size=(n, 3))
    return (pts + off).astype(np.float32)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "examples/output"
    size = "256x144"
    spp = 2
    for a in sys.argv[1:]:
        if a.startswith("--size"):
            size = a.split("=", 1)[1]
        if a.startswith("--spp"):
            spp = int(a.split("=", 1)[1])
    w, h = (int(v) for v in size.split("x"))
    os.makedirs(out_dir, exist_ok=True)

    from raymarchcl_tpu import api
    from raymarchcl_tpu.io.imageio import save_png
    from raymarchcl_tpu.models import generators, mesh

    def emit(name, argb):
        path = os.path.join(out_dir, name + ".png")
        save_png(np.asarray(argb), path)
        print("wrote", path)

    # 1. gyroid, AO preset (reference gallery "ao" shots)
    emit("gyroid-ao", api.test_render(
        width=w, height=h, iter=spp, vres=128, mat="ao", out_path=None))

    # 2. gyroid, metal preset with reflections (reference "metal" shots)
    emit("gyroid-metal", api.test_render(
        width=w, height=h, iter=spp, vres=128, mat="metal", out_path=None))

    # 3. orange-stripes preset
    emit("gyroid-orange", api.test_render(
        width=w, height=h, iter=spp, vres=128, mat="orange-stripes",
        theta=60, out_path=None))

    # 4. depth of field (reference DOF shots used iter=100)
    emit("gyroid-dof", api.test_render(
        width=w, height=h, iter=max(spp, 4), vres=128, mat="metal2",
        dof=0.04, out_path=None))

    # 5. terrain volume
    vol = generators.make_terrain({"vres": [128] * 3})
    argb, _ = api.render_frame(
        vol, (128, 128, 128), iter=spp, width=w, height=h, mat="ao",
        eyepos=[1.7, 0.9, 1.7], targetpos=[0, -0.1, 0])
    emit("terrain", argb)

    # 6. voxelized point-cloud knot (mesh pipeline, smooth normals)
    pts = torus_knot_points()
    kvol = mesh.voxelize_ks(pts, 96, 1)
    argb, _ = api.render_frame(
        kvol, (96, 96, 96), iter=spp, width=w, height=h, mat="metal",
        eyepos=[1.8, 1.0, 1.8], targetpos=[0, 0, 0])
    emit("knot-metal", argb)


if __name__ == "__main__":
    main()
