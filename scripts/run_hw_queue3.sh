#!/bin/bash
# Round-3 session-3 hardware queue: the (WIDE_SUBSTEPS x BRICK_SUBSTEPS x
# brick edge) matrix — the wide resolve changes substep economics, so depth
# and edge must be re-swept WITH it (see scripts/bench_wide_matrix.py).
# Waits for queue 2 (pid in /tmp/hw_queue2.pid) to exit first.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_queue3.log}
say() { echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"; }

if [ -f /tmp/hw_queue2.pid ]; then
  say "waiting for queue 2 (pid $(cat /tmp/hw_queue2.pid))"
  while kill -0 "$(cat /tmp/hw_queue2.pid)" 2>/dev/null; do sleep 60; done
fi
say "waiting for TPU"
until timeout 150 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" >/dev/null 2>&1; do
  sleep 180
done
say "TPU up"

say "1/1 wide-substep matrix at the headline (512^2 16spp ao)"
timeout 5400 python scripts/bench_wide_matrix.py \
  --variants F:6:8,T:6:8,T:12:8,T:16:8,T:12:16,T:16:16 >> "$LOG" 2>&1

say "queue3 done"
