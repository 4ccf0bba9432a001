#!/bin/bash
# Round-3 session c: the row the r3b script mislabeled — Wan TeaCache
# on the FULL default tier (int8-dyn + int8pv attention + rope-on-heads;
# r3b omitted the BENCH_ATTN pin, so its 71.54 s was exact softmax).
# Also refreshes the headline once so BENCH_LAST_GOOD carries the new
# attn_tier/quant audit fields.
# Usage: bash tools/r3c_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-perf_logs/r3c}
mkdir -p "$LOG"
. tools/perf_session_lib.sh

run wan_teacache_int8pv \
  env BENCH_ATTN=pallas_int8pv BENCH_TEACACHE=1.75 python bench_wan.py

run bench_default python bench.py

echo "session complete; logs in $LOG"
