"""Two-process distributed init + tiled-render agreement (VERDICT r3 item 9,
SURVEY §2.4): spawns 2 CPU-backend processes with a localhost coordinator,
each running tests/distributed_worker.py — parallel.distributed.initialize()
is exercised for real (not mocked), and each process's pixel-tile shard of
the global 2-device mesh render must bit-match a local single-device render.

Skips (not fails) where the runtime can't form the cluster (no free port,
jax build without distributed support, sandboxed CI without localhost
sockets) — the assertions only count when both workers actually ran.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "distributed_worker.py")


def _free_port():
    s = socket.socket()
    try:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
    finally:
        s.close()


def test_two_process_initialize_and_tiled_render():
    try:
        port = _free_port()
    except OSError:
        pytest.skip("no localhost sockets available")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 1-device flag
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed workers timed out (coordinator unreachable?)")
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            low = out.lower()
            if ("unable to initialize backend" in low
                    or "failed to connect" in low
                    or "deadline" in low
                    or "unimplemented" in low):
                pytest.skip(f"distributed runtime unsupported here: {out[-400:]}")
            raise AssertionError(f"worker failed:\n{out[-2000:]}")
        assert "DIST_WORKER_OK" in out, out[-2000:]
