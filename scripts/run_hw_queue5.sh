#!/bin/sh
# Round-5 hardware queue (run on the real TPU, serially; each step logs to
# /tmp/r5). Order: cheap confirmations first, then the measurement ladder.
set -x
mkdir -p /tmp/r5

# 1. config-3 scene through the FIXED stacked engine (mxu strip): expect
#    ~5.8 s (was 12.5 stacked / 6.8 unstacked with one-hot)
timeout 2400 python scripts/bench_flag_ab.py --flag render.PASS_STACK \
  --values 8,1 --volume mesh64 --vres 64 --mat ao --spp 16 \
  > /tmp/r5/q1_c3_fixed.log 2>&1

# 2. full BASELINE matrix at spec, production host_chunk=16
timeout 5400 python scripts/run_configs.py --host-chunk 16 \
  > /tmp/r5/q2_configs_hc16.log 2>&1

# 3. fresh stage split at spec under the stacked engine
timeout 3600 python scripts/profile_stages.py --size 512 --spp 16 \
  > /tmp/r5/q3_stages.log 2>&1

# 4. stacked-schedule paid-apps audit at spec
timeout 3600 python scripts/audit_apps_stacked.py \
  > /tmp/r5/q4_audit.log 2>&1

# 5. headline bench (invariant-gated; reports measured-hit Mrays now)
timeout 3600 python bench.py > /tmp/r5/q5_bench.log 2>&1

# 6. anim steady-state + preview on the current engine
timeout 3600 python scripts/bench_anim.py > /tmp/r5/q6_anim.log 2>&1

echo "QUEUE5 DONE" > /tmp/r5/queue5_done
