"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (SURVEY.md §4 multi-chip strategy).

Note: the hosted TPU plugin ignores the JAX_PLATFORMS env var, so the
programmatic `jax.config.update` is the one that actually takes effect.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
