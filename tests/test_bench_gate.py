"""The bench invariant gate must REFUSE, not decorate (VERDICT r4 item 5):
on a bit-equality invariant mismatch bench.main() still prints the JSON line
(with "invariants": false as the trace) but exits nonzero so the driver
records a failure rather than a quotable headline.

Also covers the honest total-rays model (utils/metrics): the secondary-ray
term scales by the measured primary hit fraction (misses spawn no
shadow/AO/bounce rays — renderer.cl:480-487 shades sky/fog only).
"""

import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402
from raymarchcl_tpu.utils import metrics  # noqa: E402


def test_bench_refuses_on_invariant_mismatch(monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "check_invariants",
                        lambda: {"accel_on_off": False})
    monkeypatch.setattr(
        bench, "run",
        lambda *a, **kw: calls.append((a, kw)))
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    # the JSON line is still produced (run was reached), then refused
    assert len(calls) == 1


def test_bench_proceeds_on_invariants_ok(monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "check_invariants",
                        lambda: {"accel_on_off": True, "deferred_on_off": True})
    monkeypatch.setattr(
        bench, "run",
        lambda *a, **kw: calls.append((a, kw)))
    bench.main()  # no SystemExit
    assert len(calls) == 1


def test_estimated_total_rays_hit_fraction_scaling():
    from raymarchcl_tpu.options import render_options

    opts = render_options(width=8, height=8, vres=[16, 16, 16], iter=4,
                          mat="ao")
    full = metrics.estimated_total_rays(opts, 4)
    none = metrics.estimated_total_rays(opts, 4, hit_fraction=0.0)
    half = metrics.estimated_total_rays(opts, 4, hit_fraction=0.5)
    primary = metrics.primary_rays(opts, 4)
    assert none == primary  # no hits -> primary rays only
    assert half == pytest.approx((full + none) / 2)
    assert full > primary


def test_measured_hit_fraction_tiny_scene():
    import jax.numpy as jnp
    import numpy as np

    from raymarchcl_tpu.api import build_accel_for, default_volume
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    volume, vres = default_volume((32, 32, 32))
    opts = render_options(
        width=16, height=16, vres=list(vres), iter=1, mat="ao",
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    accel = build_accel_for(volume, opts)
    table = make_mc_tables(1, seed=0)[0]
    vol = jnp.asarray(np.asarray(volume), jnp.uint8)
    f = metrics.measured_hit_fraction(vol, opts, table, accel)
    assert 0.0 <= f <= 1.0
    # the gyroid + ground plane fills most of this camera's view
    assert f > 0.25
    # accel on/off agree (the marcher is bit-equal across schedules)
    f2 = metrics.measured_hit_fraction(vol, opts, table, None)
    assert f == pytest.approx(f2, abs=1e-6)
