#!/bin/bash
# Round-5 session: refresh the full evidence ladder on the r5 tree
# (VERDICT r4 item 9) and revalidate the flagship rows on the MIXED int4
# tier that now passes the 40 dB gate (item 3):
#   1. kernel-parity probe (refreshes PARITY_KERNEL.json on this window);
#   2. bench.py default — exact headline + TeaCache/bounded/stacked
#      serving rows (now fidelity-gated via TEACACHE_GATE.json) + the new
#      request_e2e full-request row (T5 encode + decode+YUV + fetch +
#      mp4 write) + quant/teacache gate tail lines;
#   3. LTX-13B exact on int4_mixed (was int4-WO, below the accuracy bar);
#   4. LTX-13B TeaCache-1.75 serving row on the same tier;
#   5. Wan-1.3B default (exact tier sanity);
#   6. Wan-14B t2v on int4_mixed;
#   7. Wan-14B t2v TeaCache-1.75;
#   8. Wan-14B i2v on int4_mixed.
# Run SOLO (the pytest suite must not share the host) — the relay chip
# is shared and single-tenant windows are the only clean measurements.
# Usage: bash tools/r5_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-perf_logs/r5a}
mkdir -p "$LOG"
. tools/perf_session_lib.sh

run parity_probe python tools/kernel_parity_probe.py

run bench_ltx_default env BENCH_SKIP_PARITY=1 python bench.py

run bench_ltx13b_mixed env BENCH_SKIP_PARITY=1 BENCH_13B=1 python bench.py

run bench_ltx13b_mixed_tc env BENCH_SKIP_PARITY=1 BENCH_13B=1 \
  BENCH_TEACACHE=1.75 python bench.py

run wan13_default python bench_wan.py

run wan14b_mixed env BENCH_WAN_14B=1 python bench_wan.py

run wan14b_mixed_tc env BENCH_WAN_14B=1 BENCH_TEACACHE=1.75 \
  python bench_wan.py

run wan14b_i2v_mixed env BENCH_WAN_14B=1 BENCH_WAN_I2V=1 python bench_wan.py

echo "session complete; logs in $LOG"
