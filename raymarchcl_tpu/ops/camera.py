"""Camera: look-at ray generation and the turntable eye-position helper.

Parity with reference: resources/renderer.cl:456-465 (cameraRayLookat) and
core.clj:150-152 (compute-eyepos). Reference quirk preserved: `fov` acts as a
LINEAR view-plane scale (no tan()), and viewCoord.y is flipped and scaled by
invAspect.
"""

from __future__ import annotations

import math

import numpy as np

from .vecmath import V3, cross, normalize


def camera_ray_lookat(opts, state):
    """Per-pixel primary rays. state comes from sampling.init_render_state
    (jittered px/py + DOF-offset eye_pos V3). Returns (pos: V3, dir: V3)."""
    eye = state["eye_pos"]
    target = V3(opts.targetPos[0], opts.targetPos[1], opts.targetPos[2])
    up = V3(opts.up[0], opts.up[1], opts.up[2])
    forward = normalize(
        V3(target.x - eye.x, target.y - eye.y, target.z - eye.z)
    )
    right = normalize(cross(forward, up))
    w, h = opts.resolution
    vcx = state["px"] / w * opts.fov - opts.fov * 0.5
    vcy = (state["py"] / h * opts.fov - opts.fov * 0.5) * (-opts.invAspect)
    upv = cross(right, forward)
    rdir = normalize(right * vcx + upv * vcy + forward)
    return eye, rdir


def compute_eyepos(theta, dist, y):
    """Orbit camera position: rotate (0, y, dist) about +y by theta degrees
    (reference: core.clj:150-152, thi.ng rotate-y convention
    x' = x cos + z sin, z' = z cos - x sin)."""
    a = math.radians(theta)
    return np.array([dist * math.sin(a), y, dist * math.cos(a)], dtype=np.float32)
