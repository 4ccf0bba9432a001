#!/bin/bash
# Round-3 follow-up perf session: the three steps the 08:28 session
# left open. Patient waits (the relay queues FIFO under contention —
# see tools/r3_perf_session.sh header); per-step timeout bounds a
# truly dead relay.
# Usage: bash tools/r3b_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-perf_logs/r3b}
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/session.log"
  timeout 4800 env BENCH_WAIT_TPU_S=1800 "$@" 2>&1 \
    | tee "$LOG/$name.log" | tail -5
  rc=${PIPESTATUS[0]}
  echo "=== $name done rc=$rc ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/session.log"
}

# 1. Wan TeaCache honest re-run (true 30-step schedule, segmented
# executions after the worker-watchdog kill; closes the DESIGN CAVEAT)
run wan_teacache BENCH_TEACACHE=1.75 python bench_wan.py

# 2. headline refresh on the new default tier (auto -> pallas_int8pv):
# updates BENCH_LAST_GOOD.json so the driver records the best honest tier
run bench_default python bench.py

# 3. fused-prologue lowering check on the real chip (the dccc35e tile
# fix landed after the 09:14 crash; the tier stays perf-rejected but the
# opt-in env flag must not crash)
run marginal_fused python tools/mb_marginal.py base fused_prologue

# 4. TeaCache stacked on the default tier (production headline refresh)
run bench_tc BENCH_TEACACHE=1.75 python bench.py

echo "session complete; logs in $LOG"
