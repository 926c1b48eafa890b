"""raymarchcl_tpu — a TPU-native (JAX/XLA/Pallas) voxel raymarching renderer
with the capabilities of thi-ng/raymarchcl.

Layers (mirroring the reference's 4-layer pipeline, SURVEY.md §1):
  L4 api          test_render / test_anim entry points
  L3 scene/data   options + materials presets, models/ volumes, io/ formats
  L2 host runtime JAX jit pipeline + parallel/ device-mesh tiling
  L1 device       ops/ march+shade (XLA) and ops/kernels (Pallas)
"""

from .api import render_frame, test_anim, test_render
from .materials import PRESETS, get_preset
from .options import RenderOpts, render_options

__version__ = "0.1.0"

__all__ = [
    "render_frame",
    "test_render",
    "test_anim",
    "render_options",
    "RenderOpts",
    "PRESETS",
    "get_preset",
]
