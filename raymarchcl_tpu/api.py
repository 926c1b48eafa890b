"""User-facing entry points, kwarg-compatible with the reference REPL API.

`test_render` mirrors `(rm/test-render :width .. :iter .. :mat ..)`
(reference: core.clj:154-179); `test_anim` mirrors `(rm/test-anim w h iter
res mat & vname)` (core.clj:181-213), including the persistent accumulation
buffer across frames (temporal blending) and the 0.3333 per-pass time step of
the anim update path (core.clj:116 vs :105).

Volume resolution divergence (deliberate): the reference trusts a separately
passed `:vres` even when the loaded `.vox` file has a different resolution,
silently garbling the sampling (core.clj:146 loads a 512^3 file while
defaulting vres to 256). Here the volume's own resolution always wins.
"""

from __future__ import annotations

import os
import time as _time

import jax.numpy as jnp
import numpy as np

from .io import imageio, voxio
from .models import generators
from .ops import render as render_mod
from .ops.camera import compute_eyepos
from .ops.sampling import make_mc_tables
from .options import render_options

VOLUME_CACHE_DIR = os.environ.get(
    "RAYMARCHCL_TPU_VOLUME_DIR", os.path.join(os.path.dirname(__file__), "..", "volumes")
)


def default_volume(vres, kind="gyroid", cache=True):
    """Procedural volume with on-disk `.vox` caching (stands in for the
    reference's pre-baked gyroid-sliced-512-s0.01.vox, core.clj:146)."""
    if isinstance(vres, (int, np.integer)):
        vres = (int(vres),) * 3
    rx, ry, rz = vres
    path = os.path.join(VOLUME_CACHE_DIR, f"{kind}-{rx}x{ry}x{rz}.vox")
    if cache and os.path.isfile(path):
        vox, res = voxio.load_volume(path)
        return vox, res
    gen = {"gyroid": generators.make_gyroid_volume, "terrain": generators.make_terrain}[
        kind
    ]
    vox = gen({"vres": list(vres)})
    if cache:
        os.makedirs(VOLUME_CACHE_DIR, exist_ok=True)
        voxio.save_volume(path, vres, vox)
    return vox, vres


def load_or_generate_volume(vname, vres, kind="gyroid"):
    if vname:
        return voxio.load_volume(vname)
    return default_volume(vres, kind=kind)


def render_frame(
    volume, vres, *, iter=1, seed=0, times=None, accum=None, accel=True, **opt_kwargs
):
    """Mid-level entry: render a frame from an explicit volume.

    accel=True builds the empty-space-skip mip (ops/accel.py) — output is
    bit-identical either way. Returns (argb (H,W) uint32, accum (N,3)).
    """
    opts = render_options(vres=list(vres), iter=iter, **opt_kwargs)
    mc_tables = make_mc_tables(iter, seed=seed)
    acc = build_accel_for(volume, opts) if accel else None
    vol = jnp.asarray(volume, dtype=jnp.uint8).reshape(-1)
    return render_mod.render_image(
        vol, opts, mc_tables, times=times, accum=accum, accel=acc
    )


def build_accel_for(volume, opts):
    """Brick-table march accelerator (see ops/accel.py). Works on
    dense-shell volumes (gyroid) and sparse mesh volumes alike: one row
    gather stages an 8^3 brick answering several march samples, and
    brick-level Chebyshev distances license provably safe skips across free
    space. Output is bit-identical with or without it."""
    from .ops.accel import build_accel

    return build_accel(np.asarray(volume, np.uint8), opts.voxelRes, opts.isoVal)


# Reduced march budgets for interactive iteration (the reference's workflow
# is REPL-driven look development, README.org:26-38 — cheap frames first,
# quality passes after). Quarter budgets of the reference defaults
# (core.clj:54-61); reduced budgets run through the exact same parity-tested
# engine — a preview is a *legitimate* render of a cheaper configuration,
# not an approximation mode. Measured cost/quality vs the full-budget frame:
# see PERFORMANCE.md ("Preview mode").
PREVIEW_BUDGETS = dict(maxIter=32, maxVoxelIter=48, shadowIter=32, aoIter=2)


def preview_overrides(opt_kwargs, iter=1):
    """Merge preview budgets under any explicit user overrides; preview
    forces 1 spp unless the caller asked for more."""
    merged = dict(PREVIEW_BUDGETS)
    merged.update(opt_kwargs)
    return merged, max(1, iter)


def test_render(
    width=640,
    height=360,
    iter=1,
    vres=256,
    mat="metal",
    vname=None,
    out_path="foo.png",
    theta=135,
    dist=2.25,
    seed=0,
    verbose=True,
    preview=False,
    **opt_kwargs,
):
    """Still-image entry point (reference: core.clj:154-179 incl. defaults).

    preview=True renders with PREVIEW_BUDGETS (quarter march budgets) for
    interactive look development."""
    if preview:
        opt_kwargs, iter = preview_overrides(opt_kwargs, iter)
    volume, actual_vres = load_or_generate_volume(vname, vres)
    t0 = _time.perf_counter()
    argb, _ = render_frame(
        volume,
        actual_vres,
        iter=iter,
        seed=seed,
        width=width,
        height=height,
        mat=mat,
        eyepos=compute_eyepos(theta, dist, 0.35),  # core.clj:165
        targetpos=[0, -0.4, 0],  # core.clj:166
        **opt_kwargs,
    )
    argb = np.asarray(argb)
    dt = _time.perf_counter() - t0
    if verbose:
        print(f"rendered {width}x{height} @ {iter} spp in {dt:.3f}s")
    if out_path:
        imageio.save_png(argb, out_path)
    return argb


def test_anim(
    width,
    height,
    iter,
    res,
    mat,
    vname=None,
    out_dir="export",
    frames=35,
    seed=0,
    verbose=True,
):
    """35-frame turntable (reference: core.clj:181-213): per-frame camera
    path theta 0->350, y 0.44->0.45, fov 115, target y -0.15; option buffers
    rewritten per frame; accumulation buffer deliberately NOT cleared between
    frames (temporal blending, core.clj:194-208)."""
    volume, actual_vres = load_or_generate_volume(vname, (res, res, res))
    os.makedirs(out_dir, exist_ok=True)
    accum = None
    mc_tables = make_mc_tables(iter, seed=seed)
    vol = jnp.asarray(volume, dtype=jnp.uint8).reshape(-1)
    acc = None
    times = jnp.arange(iter, dtype=jnp.float32) * render_mod.TIME_STEP_ANIM
    paths = []
    for frame in range(frames):
        if verbose:
            print(f"rendering frame #{frame}")
        t = frame / frames  # map-interval frame 0 35 -> [0, 34/35)
        theta = t * 350.0
        r = 2.25
        y = 0.44 + t * (0.45 - 0.44)
        ty = -0.15
        fov = 115.0
        opts = render_options(
            width=width,
            height=height,
            vres=list(actual_vres),
            iter=iter,
            mat=mat,
            fov=fov,
            targetpos=[0, ty, 0],
            eyepos=compute_eyepos(theta, r, y),
        )
        if accum is None:
            accum = jnp.zeros((opts.num_pixels, 3), jnp.float32)
        if acc is None:
            acc = build_accel_for(volume, opts)
        argb, accum = render_mod.render_image(
            vol, opts, mc_tables, times, accum, accel=acc
        )
        out = os.path.join(out_dir, f"frame-{frame:04d}.png")
        imageio.save_png(np.asarray(argb), out)
        paths.append(out)
    return paths
