#!/bin/bash
# Wait for the relay chip to answer, then run the r3g perf session
# (parity refresh + pipe_relax A/B + honest exact-tier e2e). Patient
# 900s probes — the relay is a FIFO queue under pool contention; killed
# short probes starve. Logs to /tmp/relay_watch_r3g.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_watch_r3g.log
PROBE='import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
echo "watch start $(date -u +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 900 python -c "$PROBE" >/dev/null 2>&1; then
    echo "relay UP $(date -u +%H:%M:%S)" >> "$LOG"
    bash tools/r3g_perf_session.sh perf_logs/r3g >> "$LOG" 2>&1
    echo "perf session finished $(date -u +%H:%M:%S)" >> "$LOG"
    # land the evidence in git even if the build session is gone;
    # scope the commit to these paths only and never stage a deletion
    # of the parity record if a failed refresh removed it
    git add perf_logs/r3g 2>/dev/null
    paths="perf_logs/r3g BENCH_LAST_GOOD.json"
    [ -f PARITY_KERNEL.json ] && paths="$paths PARITY_KERNEL.json"
    git commit -q -m "Record the r3g on-hardware perf session logs" \
      -- $paths 2>/dev/null
    exit 0
  fi
  echo "relay down $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 60
done
