"""Count jaxpr ops per flat-engine while-body application.

The round-3 cost model (PERFORMANCE.md) is: while-body time ~ op count x
~0.2-0.25 us issue cost, at any operand width <= (N, 128). With scheduling
exhausted, the remaining lever is fewer ops in the one straight-line body.
This audit makes the op budget visible: it traces `raymarch` (flat engine)
in the primary and shadow (lean) configurations, walks into the state
machine's while_loop, and counts equations per APPLICATION (expanding the
inner fori_loop by its trip count and dividing by FLAT_UNROLL).

Block attribution comes from linear probes: varying FLAT_GROUND_STEPS gives
the per-ground-step slope; `lean` toggles the write-only bookkeeping ops.

Run on CPU (counts are platform-independent pre-lowering):
    python scripts/audit_body_ops.py
"""

import collections
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from raymarchcl_tpu.models import generators
from raymarchcl_tpu.ops import accel as accel_mod
from raymarchcl_tpu.ops import march
from raymarchcl_tpu.ops.vecmath import V3
from raymarchcl_tpu.options import render_options


def _count_eqns(jaxpr, weight=1.0, counter=None):
    """Recursively count equations, weighting nested loop bodies by trips."""
    if counter is None:
        counter = collections.Counter()
    for eq in jaxpr.eqns:
        prim = eq.primitive.name
        if prim in ("scan", "while", "cond", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "pjit", "jit", "custom_vjp_call_jaxpr"):
            if prim == "scan":
                trips = eq.params.get("length", 1)
                _count_eqns(eq.params["jaxpr"].jaxpr, weight * trips, counter)
            elif prim == "while":
                # inner while trip count unknowable statically; weight 1
                _count_eqns(eq.params["body_jaxpr"].jaxpr, weight, counter)
                _count_eqns(eq.params["cond_jaxpr"].jaxpr, weight, counter)
            elif prim == "cond":
                for br in eq.params["branches"]:
                    _count_eqns(br.jaxpr, weight, counter)
            else:
                inner = eq.params.get("jaxpr") or eq.params.get("call_jaxpr")
                if inner is not None:
                    ij = inner.jaxpr if hasattr(inner, "jaxpr") else inner
                    _count_eqns(ij, weight, counter)
                else:
                    counter[prim] += weight
        else:
            counter[prim] += weight
    return counter


def _find_big_while(jaxpr, found):
    for eq in jaxpr.eqns:
        if eq.primitive.name == "while":
            found.append(eq)
            _find_big_while(eq.params["body_jaxpr"].jaxpr, found)
        for k in ("jaxpr", "call_jaxpr", "body_jaxpr", "cond_jaxpr"):
            if k in eq.params and k != "body_jaxpr":
                inner = eq.params[k]
                ij = inner.jaxpr if hasattr(inner, "jaxpr") else inner
                _find_big_while(ij, found)
        if eq.primitive.name == "scan":
            _find_big_while(eq.params["jaxpr"].jaxpr, found)
        if eq.primitive.name == "cond":
            for br in eq.params["branches"]:
                _find_big_while(br.jaxpr, found)
    return found


def body_ops(opts, acc, vol, lean, n=256):
    """Ops per application of the flat state machine (by jaxpr count)."""
    zf = jnp.zeros((n,), jnp.float32)
    pos = V3(zf, zf + 0.1, zf + 2.0)
    # non-constant direction so nothing folds
    d = V3(zf + 0.1, zf - 0.5, zf - 0.8)

    def run(px):
        p = V3(px, pos.y, pos.z)
        isec = march.raymarch(
            vol, opts, p, d, 10.0, opts.maxIter, False, jnp.ones((n,), bool),
            want_normal=not lean, accel=acc, truncate_to_max_dist=lean,
            want_object=not lean,
        )
        return isec["distance"]

    jx = jax.make_jaxpr(run)(pos.x)
    whiles = _find_big_while(jx.jaxpr, [])
    # the state machine is the while with the most total (weighted) body ops
    best, best_n = None, -1
    for eq in whiles:
        c = _count_eqns(eq.params["body_jaxpr"].jaxpr)
        tot = sum(c.values())
        if tot > best_n:
            best, best_n = eq, tot
    c = _count_eqns(best.params["body_jaxpr"].jaxpr)
    per_app = {k: v / march.FLAT_UNROLL for k, v in c.items()}
    return per_app


def main():
    vol_np = generators.make_gyroid_volume({"vres": [32, 32, 32]})
    opts = render_options(width=16, height=16, vres=[32, 32, 32], mat="ao")
    acc = accel_mod.build_accel(vol_np, opts.voxelRes, opts.isoVal)
    vol = jnp.asarray(vol_np)

    for label, lean in (("primary (full carry)", False), ("shadow (lean)", True)):
        base_g = march.FLAT_GROUND_STEPS
        rows = {}
        for g in (1, 2, 4, 8):
            march.FLAT_GROUND_STEPS = g
            rows[g] = body_ops(opts, acc, vol, lean)
        march.FLAT_GROUND_STEPS = base_g
        tot = {g: sum(c.values()) for g, c in rows.items()}
        # per-ground-step slope from the 1 -> 8 span
        slope = (tot[8] - tot[1]) / 7.0
        fixed = tot[base_g] - slope * base_g
        print(f"== {label} ==")
        print(f"  ops/application at FLAT_GROUND_STEPS={base_g}: {tot[base_g]:.0f}")
        print(f"  ground block: {slope:.1f} ops/step "
              f"({slope * base_g:.0f} = {100 * slope * base_g / tot[base_g]:.0f}% of app)")
        print(f"  setup+march+book: {fixed:.0f} ops")
        top = collections.Counter(rows[base_g]).most_common(18)
        print("  top primitives (per application):")
        for k, v in top:
            print(f"    {k:24s} {v:7.1f}")
        print()


if __name__ == "__main__":
    main()
