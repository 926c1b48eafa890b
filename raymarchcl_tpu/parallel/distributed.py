"""Multi-process (multi-host) initialization for pod-scale rendering.

The reference is strictly single-device (core.clj:121-123); this module is
the TPU-native scale-out entry above `parallel/tiling.py`: on a multi-host
topology (e.g. v5e-16+, one process per host), call `initialize()` before
any JAX computation, then build meshes over `jax.devices()` (all chips in
the slice) exactly as on one host — `render_image_tiled` /
`render_image_spp_sharded` shard over the global device list and XLA routes
the psum/all-gather over ICI.

On TPU pods the coordinator/process ids come from the TPU runtime and
`jax.distributed.initialize()` needs no arguments; elsewhere the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars (or
explicit kwargs) apply. Single-process callers can skip this module
entirely — nothing here is needed for one host.

Untestable in this repo's CI (single process); kept deliberately thin: the
renderer's only cross-chip state is the sharded accumulation buffer, and
per-shard results are pure functions of GLOBAL pixel ids / pass indices
(tiling.py), so no other process coordination exists to initialize.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Idempotent jax.distributed.initialize() wrapper.

    No-ops when the session is single-process and no coordinator is
    configured (env or args), so library callers can invoke it
    unconditionally."""
    global _initialized
    if _initialized:
        return False
    env = os.environ
    configured = (
        coordinator_address is not None
        or "JAX_COORDINATOR_ADDRESS" in env
        or "COORDINATOR_ADDRESS" in env
        # TPU pod runtimes self-describe; detect a multi-host TPU slice
        or env.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    )
    if not configured:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def process_info():
    """(process_index, process_count, local_device_count) after init."""
    return (
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
    )
