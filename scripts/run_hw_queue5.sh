#!/bin/bash
# Round-3 session-3 hardware queue 5: post-WIDE-flip follow-ups.
# 1. FLAT_UNROLL re-sweep (4 was tuned on the serial body; the wide body
#    is ~30% cheaper, so per-round overhead weighs more).
# 2. BASELINE configs table refresh on the wide engine (the round-2 table
#    in PERFORMANCE.md predates both wide levers).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_queue5.log}
say() { echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"; }

if [ -f /tmp/hw_queue4.pid ]; then
  say "waiting for queue 4 (pid $(cat /tmp/hw_queue4.pid))"
  while kill -0 "$(cat /tmp/hw_queue4.pid)" 2>/dev/null; do sleep 60; done
fi
say "waiting for TPU"
until timeout 150 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" >/dev/null 2>&1; do
  sleep 180
done
say "TPU up"

say "1/2 FLAT_UNROLL re-sweep under the wide engine (headline)"
timeout 3600 python scripts/bench_flat_sweep.py --unrolls 4,8,16 --ground 4 \
  >> "$LOG" 2>&1

say "2/2 BASELINE configs refresh (wide engine)"
timeout 5400 python scripts/run_configs.py >> "$LOG" 2>&1

say "queue5 done"
