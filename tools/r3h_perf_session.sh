#!/bin/bash
# Round-3 session h: decide the relax-split adoption for the exact
# bf16 tier at d=64 (r3g measured 10.27 vs 10.78 ms kernel-level but
# single-shot) and sweep the sub-block count.
#   1. mb_attn_int8.py ltx -- now sweeps pipe_nsub (2/3/4) on the relax
#      split and repeats the headline bf16-vs-relax A/B back-to-back to
#      bound run noise.
#   2. bench_exact_relax -- the honest exact-softmax tier e2e WITH
#      LTXV_TPU_PIPE_RELAX=1 (adoption candidate; r3g exact baseline
#      without it: 13.585 s/video same session).
#   3. bench_int8pv -- refresh the best-tier headline on the same chip
#      window so the relax row has a same-session comparator.
# Usage: bash tools/r3h_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-perf_logs/r3h}
mkdir -p "$LOG"
. tools/perf_session_lib.sh

run mb_attn_int8_ltx python tools/mb_attn_int8.py ltx

run bench_exact_relax env BENCH_ATTN=pallas LTXV_TPU_PIPE_RELAX=1 \
    python bench.py

run bench_int8pv env BENCH_ATTN=pallas_int8pv python bench.py

echo "session complete; logs in $LOG"
