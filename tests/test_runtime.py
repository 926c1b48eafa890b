"""Runtime shim tests (device select + build-log parity, SURVEY.md E1)."""

import jax.numpy as jnp

from raymarchcl_tpu import runtime


def test_select_and_devices():
    assert runtime.select_platform() == "cpu"  # forced in conftest
    assert runtime.max_device().platform == "cpu"
    assert len(runtime.devices()) == 8


def test_build_and_log(capsys):
    fn = lambda x: (x * 2 + 1).sum()
    compiled = runtime.build(fn, jnp.ones((128,)), verbose=True)
    out = capsys.readouterr().out
    assert "build log:" in out
    assert float(compiled(jnp.ones((128,)))) == 3 * 128
    log = runtime.build_log(compiled)
    assert "size" in log or "flops" in log
