#!/bin/bash
# Round-3 session-3 hardware queue 4: the WIDE_GROUND lever, post
# WIDE_SUBSTEPS flip (default True after its 6.66 -> 4.92 s HW win).
# 1. wide_ground_on_off bit-equality invariant (metal exercises bounce +
#    shadow + ground paths).
# 2. (WIDE_GROUND x FLAT_GROUND_STEPS) matrix at the headline.
# 3. TILE_RAYS re-sweep under the wide engine (4096 was tuned serial).
# 4. exit: invariant-gated bench.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_queue4.log}
say() { echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"; }

if [ -f /tmp/hw_queue3.pid ]; then
  say "waiting for queue 3 (pid $(cat /tmp/hw_queue3.pid))"
  while kill -0 "$(cat /tmp/hw_queue3.pid)" 2>/dev/null; do sleep 60; done
fi
say "waiting for TPU"
until timeout 150 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" >/dev/null 2>&1; do
  sleep 180
done
say "TPU up"

say "1/4 wide_ground_on_off invariant (64^2 metal)"
timeout 1800 python scripts/tpu_invariants.py --size 64 --vres 96 --spp 1 \
  --only wide_ground_on_off >> "$LOG" 2>&1

say "2/4 (WIDE_GROUND x FLAT_GROUND_STEPS) matrix at the headline"
timeout 3600 python scripts/bench_ground_matrix.py \
  --variants F:4,T:4,T:8,T:16 >> "$LOG" 2>&1

say "3/4 TILE_RAYS re-sweep under the wide engine"
timeout 3600 python scripts/bench_tileray_sweep.py --spp 16 \
  --tiles 2048,4096,8192 >> "$LOG" 2>&1

say "4/4 exit bench (invariant-gated headline)"
timeout 3000 python bench.py >> "$LOG" 2>&1

say "queue4 done"
