#!/bin/bash
# Wait for the relay chip to answer, then run the r3j perf session and
# land the evidence in git even if the build session is gone. Patient
# 900s probes: the relay is a FIFO queue under pool contention — a
# killed short probe loses its place and can never get through.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_watch_r3j.log
PROBE='import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
echo "watch start $(date -u +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 900 python -c "$PROBE" >/dev/null 2>&1; then
    echo "relay UP $(date -u +%H:%M:%S)" >> "$LOG"
    bash tools/r3j_perf_session.sh perf_logs/r3j >> "$LOG" 2>&1
    echo "perf session finished $(date -u +%H:%M:%S)" >> "$LOG"
    git add perf_logs/r3j 2>/dev/null
    paths="perf_logs/r3j BENCH_LAST_GOOD.json"
    [ -f PARITY_KERNEL.json ] && paths="$paths PARITY_KERNEL.json"
    git commit -q -m "Record the r3j on-hardware perf session logs" \
      -- $paths 2>/dev/null
    exit 0
  fi
  echo "relay down $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 60
done
