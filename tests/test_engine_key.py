"""engine_key() completeness — structural closure of the CLAUDE.md footgun
(VERDICT r4 weak #5): every module-level UPPERCASE scheduling flag in
render/march/shade/accel must hash into the jit key, or flipping it silently
reuses the stale cached program (the round-2 vacuous-A/B hole).

Policy: a flag is either (a) in engine_key() — flipping it changes the key —
or (b) on the documented allowlist below with a reason. A NEW flag added to
any of these modules fails this test until the author picks one.
"""

import re

import pytest

from raymarchcl_tpu.ops import accel, march, render, shade

MODULES = {"render": render, "march": march, "shade": shade, "accel": accel}

# Flags that legitimately do NOT hash into the jit key. Every entry needs a
# reason; "it's inconvenient" is not one.
ALLOWLIST = {
    # Host-side time-ladder constants: they shape the streamed `times`
    # VALUES (bench.py / api.py build the vector on host), never the traced
    # program.
    ("render", "TIME_STEP_INIT"),
    ("render", "TIME_STEP_ANIM"),
    # Accel BUILD-time knobs: baked into the Accel table at build_accel time
    # and decoded through Accel.edge / pytree structure (static aux — a
    # different table retraces by itself; see accel.set_brick docstring).
    ("accel", "BRICK"),
    ("accel", "BRICK_SHIFT"),
    ("accel", "BRICK_MASK"),
    ("accel", "DIST_W"),
    ("accel", "ROW_WORDS"),
    ("accel", "NRM_BRICK"),
    ("accel", "NRM_ROW_WORDS"),
    # Build-time gate: decides whether byte-plane MXU copies are STORED in
    # the Accel (accel.py:251-253); the march branches on `accel.mxu is
    # None`, which is pytree structure and retraces by itself.
    ("accel", "ONEHOT_MAX_ROWS"),
    # Fixed row-layout constant (word offset of the stop-bit plane). No
    # setter; changing it requires a matching accel rebuild, whose new table
    # shape retraces.
    ("accel", "STOP_W0"),
}


def _flags(mod):
    return [
        (k, v)
        for k, v in vars(mod).items()
        if re.fullmatch(r"[A-Z][A-Z0-9_]*", k)
        and isinstance(v, (bool, int, float))
    ]


def _flip(v):
    if isinstance(v, bool):
        return not v
    return v + 1


@pytest.mark.parametrize("mod_name", sorted(MODULES))
def test_every_flag_hashes_into_engine_key(mod_name):
    mod = MODULES[mod_name]
    base = render.engine_key()
    missing = []
    for name, val in _flags(mod):
        if (mod_name, name) in ALLOWLIST:
            continue
        try:
            setattr(mod, name, _flip(val))
            if render.engine_key() == base:
                missing.append(name)
        finally:
            setattr(mod, name, val)
    assert not missing, (
        f"flags in ops/{mod_name}.py NOT hashed by render.engine_key(): "
        f"{missing} — add them to engine_key() (or, with a documented "
        f"reason, to the ALLOWLIST in this test). An unhashed trace-time "
        f"flag silently reuses stale compiled programs."
    )


def test_allowlist_entries_exist():
    stale = [
        (m, n) for (m, n) in ALLOWLIST if not hasattr(MODULES[m], n)
    ]
    assert not stale, f"ALLOWLIST entries no longer exist: {stale}"
