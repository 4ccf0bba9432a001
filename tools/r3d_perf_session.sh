#!/bin/bash
# Round-3 session d: measure the conv3d->framewise-2D decomposition and
# the int8 sub-block pipelining experiment on the real chip. Steps:
#   1. fresh kernel-parity record (standalone probe, decoupled from bench)
#   2. tools/mb_conv3d.py A/B (NDHWC 3-D conv vs summed NHWC 2-D convs
#      at the Wan decoder's serving shapes)
#   3. bench_wan.py honest default tier -- the e2e Wan number with the
#      decomposed VAE decode (prev: 8.0 s decode / ~116.9 s video)
#   4. bench.py -- LTX headline with the decomposed LTX VAE decode
#      (prev: 0.49 s decode / 13.275 s video)
#   5-6. tools/mb_attn_int8.py at both serving shapes -- the int8 tiers
#      with and without sub-block pipelining (LTXV_TPU_INT8_PIPE)
# Usage: bash tools/r3d_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-perf_logs/r3d}
mkdir -p "$LOG"
. tools/perf_session_lib.sh

run parity python tools/kernel_parity_probe.py

run mb_conv3d python tools/mb_conv3d.py

run wan_default python bench_wan.py

run bench_default python bench.py

run mb_attn_int8_wan python tools/mb_attn_int8.py wan

run mb_attn_int8_ltx python tools/mb_attn_int8.py ltx

echo "session complete; logs in $LOG"
