#!/bin/bash
# Round-3 session-2 hardware queue: the wide-substep-resolve A/B.
# Waits for the first queue (pid in /tmp/hw_queue.pid) to exit, then runs
# the WIDE_SUBSTEPS experiments on the one chip. Logs to $LOG.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_queue2.log}
say() { echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"; }

if [ -f /tmp/hw_queue.pid ]; then
  say "waiting for queue 1 (pid $(cat /tmp/hw_queue.pid))"
  while kill -0 "$(cat /tmp/hw_queue.pid)" 2>/dev/null; do sleep 60; done
fi
say "waiting for TPU"
until timeout 150 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" >/dev/null 2>&1; do
  sleep 180
done
say "TPU up"

say "1/2 wide_substeps_on_off invariant (64^2 metal — bounce/shadow/normal paths)"
timeout 1800 python scripts/tpu_invariants.py --size 64 --vres 96 --spp 1 \
  --only wide_substeps_on_off >> "$LOG" 2>&1

say "2/2 WIDE_SUBSTEPS A/B at the headline (512^2 16spp ao)"
timeout 3000 python scripts/bench_flag_ab.py --flag march.WIDE_SUBSTEPS >> "$LOG" 2>&1

say "queue2 done"
