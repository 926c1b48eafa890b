"""Pallas TPU kernel for TonemapImage (reference: renderer.cl:496-508).

Fuses tonemap ((c/(g+c))^2), 255-scale, clamp, and ARGB bit-packing over
SoA channel planes. Elementwise VPU work on (rows, 128) tiles; equivalent
to ops.render.pack_argb (asserted in tests), usable as a drop-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 64  # rows per grid step: 64*128 = 8192 pixels / program


def _kernel(r_ref, g_ref, b_ref, gamma_ref, out_ref):
    g = gamma_ref[0]

    def tm(c):
        t = c / (g + c)
        t = t * t * 255.0
        # f32 -> u32 directly is unsupported by Mosaic; go through i32
        # (values are clamped non-negative)
        return jnp.clip(t, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint32)

    out_ref[:] = (
        jnp.uint32(0xFF000000)
        | (tm(r_ref[:]) << 16)
        | (tm(g_ref[:]) << 8)
        | tm(b_ref[:])
    )


def tonemap_pack_pallas(accum, gamma, interpret=False):
    """accum: (N, 3) float32 -> (N,) uint32 0xAARRGGBB."""
    n = accum.shape[0]
    block = _ROWS * _LANES
    n_pad = -(-n // block) * block
    r = jnp.zeros((n_pad,), jnp.float32).at[:n].set(accum[:, 0]).reshape(-1, _LANES)
    g = jnp.zeros((n_pad,), jnp.float32).at[:n].set(accum[:, 1]).reshape(-1, _LANES)
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(accum[:, 2]).reshape(-1, _LANES)
    gamma_arr = jnp.asarray(gamma, jnp.float32).reshape(1)

    grid = (n_pad // block,)
    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            spec,
            spec,
            spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // _LANES, _LANES), jnp.uint32),
        interpret=interpret,
    )(r, g, b, gamma_arr)
    return out.reshape(-1)[:n]
