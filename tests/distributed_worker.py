"""Worker process for tests/test_distributed.py: joins a 2-process CPU
"cluster" via parallel.distributed.initialize, renders its pixel-tile shard
of a tiny frame over the GLOBAL 2-device mesh, and bit-compares the shard
against a local single-device render of the full frame (pixel identity
drives all per-ray state, so tiled == untiled exactly — the multi-process
version of tests/test_parallel.py's single-process claim).

Usage: python distributed_worker.py <process_id> <num_processes> <port>
Exits 0 on success; prints DIST_WORKER_OK on the last line.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raymarchcl_tpu.models import generators  # noqa: E402
from raymarchcl_tpu.ops import render as render_mod  # noqa: E402
from raymarchcl_tpu.ops.accel import build_accel  # noqa: E402
from raymarchcl_tpu.ops.camera import compute_eyepos  # noqa: E402
from raymarchcl_tpu.ops.sampling import make_mc_tables  # noqa: E402
from raymarchcl_tpu.options import render_options  # noqa: E402
from raymarchcl_tpu.parallel import distributed, tiling  # noqa: E402

ok = distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc,
    process_id=pid,
)
assert ok, "initialize() must engage when a coordinator is configured"
assert not distributed.initialize(), "second call must be a no-op"
assert distributed.process_info() == (pid, nproc, 1), distributed.process_info()
assert len(jax.devices()) == nproc, jax.devices()

opts = render_options(
    width=24, height=16, vres=[16, 16, 16], iter=2, mat="ao",
    maxIter=12, maxVoxelIter=24, shadowIter=12,
    eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
)
vol_np = generators.make_gyroid_volume({"vres": [16, 16, 16]})
acc = build_accel(vol_np, opts.voxelRes, opts.isoVal)
tables = make_mc_tables(2, seed=0)
times = jnp.arange(2, dtype=jnp.float32) * render_mod.TIME_STEP_INIT

# local single-device reference (full frame, this process's device only)
ref_argb, _ = render_mod.render_image(
    jnp.asarray(vol_np, jnp.uint8).reshape(-1), opts, tables, accel=acc
)
ref_flat = np.asarray(ref_argb).reshape(-1)

# global tiled render over the 2-process mesh (the lower-level _tiled_fn:
# render_image_tiled's np.asarray would need an all-gather across hosts;
# comparing addressable shards is the multi-host-native check)
mesh = tiling.make_mesh()
n_pix = opts.num_pixels
n_pad = -(-n_pix // nproc) * nproc
accum = jax.make_array_from_callback(
    (n_pad, 3), NamedSharding(mesh, P(tiling.AXIS)),
    lambda idx: np.zeros((n_pad, 3), np.float32)[idx],
)
rep = NamedSharding(mesh, P())
vol_g = jax.device_put(jnp.asarray(vol_np, jnp.uint8).reshape(-1), rep)
fn = tiling._tiled_fn(mesh, opts, n_pad)
accum_g, argb_g = fn(opts, vol_g, tables, times, accum, acc)

blk = n_pad // nproc
for shard in argb_g.addressable_shards:
    lo = shard.index[0].start or 0
    got = np.asarray(shard.data)
    want = ref_flat[lo : lo + blk]
    np.testing.assert_array_equal(got, want[: got.shape[0]])

print("DIST_WORKER_OK", flush=True)
