"""Checkpoint/resume for progressive renders.

The reference's accumulation buffer IS a resumable state: each pass blends
into p-buf (renderer.cl:492) and `test-anim` exploits its persistence across
executions (core.clj:194-208, SURVEY.md §5). Here that state is first-class:
save/load the accumulation array plus enough metadata to validate a resume,
and a chunked driver that checkpoints between spp chunks so long renders
survive interruption.
"""

from __future__ import annotations

import hashlib
import json
import os

import jax.numpy as jnp
import numpy as np


def pass_digest(mc_tables, times, seed=None):
    """Digest of everything that determines a pass sequence's output (the MC
    tables and time seeds). Two renders blend compatibly iff this matches."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(np.asarray(mc_tables, np.float32)).tobytes())
    h.update(np.ascontiguousarray(np.asarray(times, np.float32)).tobytes())
    h.update(repr(seed).encode())
    return h.hexdigest()[:32]


def save_accum(path, accum, opts, passes_done, seed=None, digest=None):
    """Write accumulation state + metadata. `path` gets .npz appended
    if missing."""
    if not str(path).endswith(".npz"):
        path = str(path) + ".npz"
    meta = {
        "resolution": list(opts.resolution),
        "voxelRes": list(opts.voxelRes),
        "passes_done": int(passes_done),
        "frameBlend": float(opts.frameBlend),
        "seed": seed,
        "digest": digest,
        "format": "raymarchcl_tpu/accum/v1",
    }
    np.savez_compressed(
        path, accum=np.asarray(accum, np.float32), meta=json.dumps(meta)
    )
    return path


def load_accum(path, opts=None):
    """Read accumulation state -> (accum (N,3) f32, meta dict). If `opts` is
    given, validates resolution compatibility."""
    if not str(path).endswith(".npz"):
        path = str(path) + ".npz"
    with np.load(path, allow_pickle=False) as z:
        accum = z["accum"]
        meta = json.loads(str(z["meta"]))
    if meta.get("format") != "raymarchcl_tpu/accum/v1":
        raise ValueError(f"{path}: not an accumulation checkpoint")
    if opts is not None and list(opts.resolution) != meta["resolution"]:
        raise ValueError(
            f"{path}: checkpoint is {meta['resolution']}, opts want "
            f"{list(opts.resolution)}"
        )
    return accum, meta


def render_checkpointed(
    vol, opts, mc_tables, ckpt_path, chunk=8, times=None, progress=None,
    accel=None,
):
    """Render all spp passes in chunks, checkpointing after each chunk and
    resuming from ckpt_path if it exists. Returns (argb (H,W), accum).

    The result is bit-identical to an uninterrupted render: the pass loop is
    a scan over (time, table) pairs, so splitting it at chunk boundaries
    changes nothing but the host-side checkpoint writes.
    """
    from ..ops import render as render_mod

    n_passes = mc_tables.shape[0]
    if times is None:
        times = jnp.arange(n_passes, dtype=jnp.float32) * render_mod.TIME_STEP_INIT
    digest = pass_digest(mc_tables, times)
    start = 0
    accum = None
    if os.path.exists(str(ckpt_path) if str(ckpt_path).endswith(".npz") else str(ckpt_path) + ".npz"):
        accum_np, meta = load_accum(ckpt_path, opts)
        # digest-less checkpoints (written directly via save_accum) can't be
        # validated; ones we wrote must match or the blend would be garbage
        if meta.get("digest") is not None and meta["digest"] != digest:
            raise ValueError(
                f"{ckpt_path}: checkpoint was written for different MC "
                f"tables/times (digest {meta.get('digest')} != {digest}); "
                "resuming would blend mismatched passes"
            )
        start = meta["passes_done"]
        accum = jnp.asarray(accum_np)
    if accum is None:
        accum = jnp.zeros((opts.num_pixels, 3), jnp.float32)
    argb = None
    for c0 in range(start, n_passes, chunk):
        c1 = min(c0 + chunk, n_passes)
        argb, accum = render_mod.render_image(
            vol, opts, mc_tables[c0:c1], times=times[c0:c1], accum=accum,
            accel=accel,
        )
        save_accum(ckpt_path, accum, opts, c1, digest=digest)
        if progress:
            progress(c1, n_passes)
    if argb is None:  # fully resumed; tonemap the loaded state
        w, h = opts.resolution
        argb = np.asarray(render_mod.pack_argb(opts, accum)).reshape(h, w)
    return argb, accum
