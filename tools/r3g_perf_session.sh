#!/bin/bash
# Round-3 session g: finish what r3f started (its bench_exact step ran
# against a mid-edit tree and died on a NameError; its ltx A/B predates
# the pipe_relax harness row).
#   1. kernel_parity_probe -- fresh on-hardware parity record for the
#      sub_block_plan refactor + pipe_relax plumbing (the pytest suite
#      only exercises the kernel under the CPU interpreter).
#   2. mb_attn_int8.py ltx -- now prints the compiled sub-block plan per
#      row and A/Bs the opt-in LTXV_TPU_PIPE_RELAX row split at the LTX
#      serving shape (block_kv=2688 -> bsub=1344), which the old %256
#      gate kept at nsub=1.
#   3. BENCH_ATTN=pallas bench.py -- the honest exact-softmax tier e2e
#      (prev 13.75 s/video, before the conv decomposition landed).
# Usage: bash tools/r3g_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-perf_logs/r3g}
mkdir -p "$LOG"
. tools/perf_session_lib.sh

run kernel_parity python tools/kernel_parity_probe.py

run mb_attn_int8_ltx python tools/mb_attn_int8.py ltx

run bench_exact env BENCH_ATTN=pallas python bench.py

echo "session complete; logs in $LOG"
