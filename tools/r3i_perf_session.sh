#!/bin/bash
# Round-3 session i: post-adoption follow-ups.
#   1/2. mb_attn_int8 at both shapes -- now carries bounded-score rows
#      (the bounded fold is order-independent too; does the sub-block
#      overlap that won for exact-bf16 also win there?) plus a window
#      sentinel so contended-chip A/Bs are visibly suspect.
#   3. mb_block_sweep -- re-rank block shapes with the production
#      pipe_relax default (the 768x2688 optimum predates the split).
#   4. TeaCache e2e on the NEW default tier (exact+relax; prior rows
#      were exact-unsplit 7.32 / int8pv 7.34).
# Usage: bash tools/r3i_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-perf_logs/r3i}
mkdir -p "$LOG"
. tools/perf_session_lib.sh

run mb_attn_int8_ltx python tools/mb_attn_int8.py ltx

run mb_attn_int8_wan python tools/mb_attn_int8.py wan

run mb_block_sweep python tools/mb_block_sweep.py

run bench_teacache env BENCH_TEACACHE=1.75 python bench.py

echo "session complete; logs in $LOG"
