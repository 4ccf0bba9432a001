#!/bin/bash
# Round-3 session e: the two reruns r3d left open.
#   1. bench_wan.py -- the r3d run died in DENOISE with an HBM
#      ResourceExhausted (before any decomposed-conv program compiled),
#      i.e. pool contention; rerun to (a) confirm the default Wan e2e
#      still lands ~116.9 s and (b) measure the decomposed-conv tiled
#      decode (prev 8.0 s) including its fp32-accumulator transients.
#   2. mb_attn_int8.py wan -- the r3d attempt benched f32-K kernels and
#      scoped-vmem-OOM'd (harness carry-dtype bug, fixed); the d=128
#      int8-pipe A/B is the open question (d=64 measured a wash).
# Usage: bash tools/r3e_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-perf_logs/r3e}
mkdir -p "$LOG"
. tools/perf_session_lib.sh

run wan_default python bench_wan.py

run mb_attn_int8_wan python tools/mb_attn_int8.py wan

echo "session complete; logs in $LOG"
