#!/bin/bash
# Round-3 late-session hardware queue: waits for the TPU worker to recover,
# then runs the pending experiments sequentially (one chip), logging to
# $LOG (default /tmp/hw_queue.log). Steps are independent — a failure
# (worker crash mid-step) skips to the next; rerun the script to retry.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_queue.log}
say() { echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"; }

say "waiting for TPU"
until timeout 150 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" >/dev/null 2>&1; do
  sleep 180
done
say "TPU up — running queue"

say "1/5 invariants: brick_edge_16 + stacked_lights_on_off (64^2 metal)"
timeout 1800 python scripts/tpu_invariants.py --size 64 --vres 96 --spp 1 \
  --only brick_edge_16,stacked_lights_on_off >> "$LOG" 2>&1

say "2/5 FLAT_GROUND_STEPS sweep at unroll 4 (headline)"
timeout 2400 python scripts/bench_flat_sweep.py --unrolls 4 --ground 2,8 >> "$LOG" 2>&1

say "3/5 stacked lights A/B (512^2 metal 8spp ~ config 4)"
timeout 2400 python scripts/bench_flag_ab.py --flag shade.STACK_LIGHT_SHADOWS \
  --mat metal --spp 8 >> "$LOG" 2>&1

say "4/5 brick edge A/B (16@12 vs 8@6, headline)"
timeout 3000 python scripts/bench_brick_edge.py --edges 8,16 --substeps 6,12 >> "$LOG" 2>&1

say "5/5 exit bench (invariant-gated headline)"
timeout 2400 python bench.py >> "$LOG" 2>&1

say "queue done"
