"""Thin host-runtime shim: device selection and compile diagnostics.

Parity surface for the reference's simplecl usage (SURVEY.md E1):
platform/device selection (core.clj:121-123 picks the max-FLOPS device),
program compilation with a printed build log (core.clj:124-131). On the JAX
stack the driver layer IS the runtime, so this module just exposes the same
ergonomics: pick a device, compile a render function ahead of time, and
report what the compiler produced.
"""

from __future__ import annotations

import jax


def select_platform():
    """Backend name (the 'platform'), e.g. 'tpu' or 'cpu'."""
    return jax.default_backend()


def max_device(platform=None):
    """The best available device — TPU over CPU, first of its kind
    (the reference picks the max-FLOPS GPU, core.clj:122)."""
    devs = jax.devices(platform) if platform else jax.devices()
    return devs[0]


def devices(platform=None):
    return jax.devices(platform) if platform else jax.devices()


def build(fn, *example_args, device=None, verbose=False):
    """Ahead-of-time compile `fn` for the example args — the analog of
    `cl/init-state` + build-log printing (core.clj:124-131).

    Returns the compiled executable; prints compiler stats when verbose.
    """
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    if verbose:
        print(build_log(compiled))
    return compiled


def build_log(compiled) -> str:
    """Human-readable compile report (the reference prints the OpenCL build
    log; XLA gives us cost analysis + memory footprint instead)."""
    lines = ["build log:", "-" * 19]
    try:
        mem = compiled.memory_analysis()
        lines.append(f"generated code: {getattr(mem, 'generated_code_size_in_bytes', '?')} B")
        lines.append(f"argument size:  {getattr(mem, 'argument_size_in_bytes', '?')} B")
        lines.append(f"output size:    {getattr(mem, 'output_size_in_bytes', '?')} B")
        lines.append(f"temp size:      {getattr(mem, 'temp_size_in_bytes', '?')} B")
    except Exception as e:  # pragma: no cover - backend-dependent
        lines.append(f"(memory analysis unavailable: {e})")
    try:
        cost = compiled.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            for k in ("flops", "bytes accessed", "transcendentals"):
                if k in c:
                    lines.append(f"{k}: {c[k]:.3e}")
    except Exception as e:  # pragma: no cover
        lines.append(f"(cost analysis unavailable: {e})")
    return "\n".join(lines)
