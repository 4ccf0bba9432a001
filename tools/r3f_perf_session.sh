#!/bin/bash
# Round-3 session f: kernel A/Bs enabled by the pipe-gate fix.
#   1. mb_attn_int8.py ltx -- at the LTX shape (block_kv=2688) the old
#      %256 gate kept EVERY pipelined variant at nsub=1, and the old
#      harness benched f32-K kernels; with the row-alignment gate the
#      exact-bf16 kernel splits sub-blocks here for the first time and
#      the int8 pipe rows become a real A/B.
#   2. mb_attn_int8.py wan -- d=128 A/B with the fixed harness.
#   3. BENCH_ATTN=pallas bench.py -- the honest exact-softmax tier e2e,
#      which the gate relaxation changes (prev 13.75 s/video).
# Usage: bash tools/r3f_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-perf_logs/r3f}
mkdir -p "$LOG"
. tools/perf_session_lib.sh

run mb_attn_int8_ltx python tools/mb_attn_int8.py ltx

run mb_attn_int8_wan python tools/mb_attn_int8.py wan

run bench_exact env BENCH_ATTN=pallas python bench.py

echo "session complete; logs in $LOG"
