"""Camera: look-at ray generation and the turntable eye-position helper.

Parity with reference: resources/renderer.cl:456-465 (cameraRayLookat) and
core.clj:150-152 (compute-eyepos). Reference quirk preserved: `fov` acts as a
LINEAR view-plane scale (no tan()), and viewCoord.y is flipped and scaled by
invAspect.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .vecmath import cross, normalize


def camera_ray_lookat(opts, state):
    """Per-pixel primary rays. state comes from sampling.init_render_state
    (jittered pixel_pos + DOF-offset eye_pos). Returns (pos (N,3), dir (N,3)).
    """
    eye = state["eye_pos"]
    forward = normalize(opts.targetPos[None, :] - eye)
    right = normalize(cross(forward, opts.up[None, :]))
    res = jnp.asarray(opts.resolution, jnp.float32)
    vc = state["pixel_pos"] / res * opts.fov - opts.fov * 0.5
    vcy = vc[:, 1] * (-opts.invAspect)
    rdir = normalize(right * vc[:, 0:1] + cross(right, forward) * vcy[:, None] + forward)
    return eye, rdir


def compute_eyepos(theta, dist, y):
    """Orbit camera position: rotate (0, y, dist) about +y by theta degrees
    (reference: core.clj:150-152, thi.ng rotate-y convention
    x' = x cos + z sin, z' = z cos - x sin)."""
    a = math.radians(theta)
    return np.array([dist * math.sin(a), y, dist * math.cos(a)], dtype=np.float32)
