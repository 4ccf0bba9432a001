#!/bin/bash
# Round-3 session j: clean-window e2e confirms for the two open r3i
# leads (both kernel-level wins that need an end-to-end replication
# before adoption — DESIGN.md "Open r3i leads"):
#   1. parity gate refresh (standalone probe, VERDICT r2 item 8).
#   2/3. LTX block-plan A/B: the post-split re-sweep ranks the
#      requested 1344x2688 plan (fit-resolves to bq=896 x bkv=1792)
#      at 8.079 ms/layer vs the shipped default's 8.329 (-3%). Both
#      rows run back-to-back in the same chip window via the new
#      LTXV_TPU_BLOCK_Q/BLOCK_KV dispatch knobs.
#   4/5. Wan exact-split A/B: the row-split EXACT kernel at nsub=4
#      measured 81.28 ms vs int8pv's 84.0-84.1 at the d=128 Wan shape
#      (r3i, same window). If it replicates e2e, the honest exact
#      kernel is the fastest tier at BOTH head dims and `auto` stops
#      needing int8pv. Forced via BENCH_ATTN=pallas +
#      LTXV_TPU_PIPE_NSUB=4 (the exact path splits under the default
#      pipe_relax; nsub overrides the default 2).
#   6. TeaCache headline on whichever LTX plan the A/B favors is left
#      to the adoption commit -- this session only gathers evidence.
# Usage: bash tools/r3j_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-perf_logs/r3j}
mkdir -p "$LOG"
. tools/perf_session_lib.sh

run parity_probe python tools/kernel_parity_probe.py

run bench_ltx_default env BENCH_SKIP_PARITY=1 python bench.py

run bench_ltx_blockplan env BENCH_SKIP_PARITY=1 \
  LTXV_TPU_BLOCK_Q=1344 LTXV_TPU_BLOCK_KV=2688 python bench.py

run wan_default python bench_wan.py

run wan_exact_n4 env BENCH_ATTN=pallas LTXV_TPU_PIPE_NSUB=4 \
  python bench_wan.py

echo "session complete; logs in $LOG"
