# Shared helper for the on-hardware perf session scripts. Source this
# instead of copy-pasting run() — the r3b copy drifted from r3's in
# exactly the way that produced a mislabeled measurement (the wan
# teacache step lost its BENCH_ATTN pin).
#   LOG must be set by the caller before run() is used.
run() {
  name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/session.log"
  timeout "${RUN_TIMEOUT_S:-4800}" \
    env BENCH_WAIT_TPU_S="${RUN_WAIT_TPU_S:-1800}" "$@" 2>&1 \
    | tee "$LOG/$name.log" | tail -5
  rc=${PIPESTATUS[0]}
  echo "=== $name done rc=$rc ($(date -u +%H:%M:%S)) ===" \
    | tee -a "$LOG/session.log"
}
