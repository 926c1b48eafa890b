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


def test_distributed_initialize_noop(monkeypatch):
    """Single-process sessions with no coordinator configured must no-op
    (library callers invoke initialize() unconditionally)."""
    from raymarchcl_tpu.parallel import distributed

    monkeypatch.setattr(distributed, "_initialized", False)
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.initialize() is False
    # idempotence: a (simulated) prior initialization short-circuits even
    # when a coordinator IS configured
    monkeypatch.setattr(distributed, "_initialized", True)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    assert distributed.initialize() is False


def test_distributed_initialize_forwards_kwargs(monkeypatch):
    """Explicit args reach jax.distributed.initialize and flip the guard."""
    import jax

    from raymarchcl_tpu.parallel import distributed

    monkeypatch.setattr(distributed, "_initialized", False)
    seen = {}
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: seen.update(kw)
    )
    assert distributed.initialize("10.0.0.1:8476", 4, 2) is True
    assert seen == {
        "coordinator_address": "10.0.0.1:8476",
        "num_processes": 4,
        "process_id": 2,
    }
    assert distributed._initialized is True
