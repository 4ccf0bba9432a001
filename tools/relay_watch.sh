#!/bin/bash
# Wait for the relay chip to answer, then run the r3 perf session.
# Probes with a PATIENT 900s killable subprocess (the relay is a FIFO
# queue under pool contention — a killed short probe loses its place
# and can never get through; measured r3: one patient attempt succeeds
# after ~626s while 20s probes starve). Logs to /tmp/relay_watch.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_watch.log
PROBE='import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
echo "watch start $(date -u +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 900 python -c "$PROBE" >/dev/null 2>&1; then
    echo "relay UP $(date -u +%H:%M:%S)" >> "$LOG"
    bash tools/r3_perf_session.sh /tmp/r3_perf >> "$LOG" 2>&1
    echo "perf session finished $(date -u +%H:%M:%S)" >> "$LOG"
    # land the evidence in git even if the build session is gone:
    # session logs + the refreshed last-good/parity records
    mkdir -p perf_logs/r3
    cp /tmp/r3_perf/*.log perf_logs/r3/ 2>/dev/null
    # scope the commit to these paths only (never sweep in whatever the
    # build session has staged) and never stage a deletion of the parity
    # record if a failed refresh removed it
    git add perf_logs/r3 2>/dev/null
    paths="perf_logs/r3 BENCH_LAST_GOOD.json"
    [ -f PARITY_KERNEL.json ] && paths="$paths PARITY_KERNEL.json"
    git commit -q -m "Record the r3 on-hardware perf session logs" \
      -- $paths 2>/dev/null
    exit 0
  fi
  echo "relay down $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 60
done
