#!/bin/bash
# Round-3 perf session: run when the relay chip is reachable (possibly
# through a long FIFO queue — measured r3: short probes starve while a
# patient attempt succeeds after ~10 min, so every step WAITS instead
# of probing; the per-step timeout bounds a truly dead relay).
# Priority order — driver-visible artifacts first, experiments after —
# so a relay flap mid-session still leaves the round's evidence.
# Usage: bash tools/r3_perf_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3_perf}
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/session.log"
  timeout 4800 env BENCH_WAIT_TPU_S=1800 "$@" 2>&1 \
    | tee "$LOG/$name.log" | tail -5
  rc=${PIPESTATUS[0]}   # the command's status, not tail's (always 0)
  echo "=== $name done rc=$rc ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/session.log"
}

# 1. fresh on-hardware kernel parity record (decoupled gate)
run parity python tools/kernel_parity_probe.py --wait 1800

# 2. honest headline (updates BENCH_LAST_GOOD.json for the driver)
run bench_honest python bench.py

# 3. int8pv end-to-end (replaces the 'projected' DESIGN row)
run bench_int8pv BENCH_ATTN=pallas_int8pv python bench.py

# 4. marginal ablations: prologue ceiling + fused tier + rope-on-heads
run marginal python tools/mb_marginal.py base no_norm_mod norm_id \
  mod_rowvec rope_heads int8pv_self fused_prologue fused_all

# 5. Wan TeaCache honest re-run (true 30-step schedule)
run wan_teacache BENCH_TEACACHE=1.75 \
  BENCH_ATTN=pallas_int8pv python bench_wan.py

# 6. Wan tier A/B (incl. rope-on-heads rows)
run wan_tiers python tools/mb_wan_tiers.py

# 7. fused-int8 block sweep at serving shapes
run ffn_sweep python tools/mb_ffn_sweep.py

# 8. 13B distilled-serving row refresh
run bench_13b BENCH_13B=1 BENCH_ATTN=pallas_int8pv python bench.py

# 9. combined best-tier candidate (all opt-in fusions + int8pv) — the
# marginal table (step 4) arbitrates if any tier regresses the combo
run bench_combo BENCH_ATTN=pallas_int8pv \
  LTXV_TPU_ROPE_HEADS=1 LTXV_TPU_FUSED_PROLOGUE=1 python bench.py

# 10. production-best headline: TeaCache 1.75x stacked on the combined
# tier (the serving mode a reference user actually runs)
run bench_combo_tc BENCH_TEACACHE=1.75 \
  BENCH_ATTN=pallas_int8pv LTXV_TPU_ROPE_HEADS=1 \
  LTXV_TPU_FUSED_PROLOGUE=1 python bench.py

# 11. 13B TeaCache row refresh on the best tier
run bench_13b_tc BENCH_13B=1 BENCH_TEACACHE=1.75 \
  BENCH_ATTN=pallas_int8pv python bench.py

echo "session complete; logs in $LOG"
