#!/bin/bash
# Round-5 chip measurement queue (sequential — the tunnel serializes
# anyway and concurrent runs poison each other's windows).
#   bash tools/remeasure_r5.sh [outdir]
#
# Advisor r4 fix: pipefail + per-stage exit status so a crashed run can
# never be committed as evidence of success. Each stage logs PASS/FAIL
# with its exit code in run.log.
set -uo pipefail
OUT=${1:-docs/r5_measurements}
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/run.log"; }

stage() {
    local name=$1; shift
    log "START $name: $*"
    if "$@" 2>&1 | tee "$OUT/$name.txt"; then
        log "PASS  $name"
    else
        local rc=$?
        log "FAIL  $name (exit $rc)"
    fi
}

# 1 — the reference's published protocol: 5-method dim-128 latency grid
#     (r4 run died at ada on the since-fixed OOM; cafe+ada rows missing).
stage latency_grid timeout 3600 python tools/latency_grid.py \
    --out "$OUT/latency_grid.jsonl" --boards "$OUT/latency_boards"

# 2 — step budget at both protocol shapes.
stage step_breakdown timeout 1200 python tools/step_breakdown.py
stage step_breakdown_128 timeout 1800 python tools/step_breakdown.py \
    --shapes criteotb

# 3 — perf-decision A/Bs (r3 carry-over; r4 produced no data).
stage ab_decisions timeout 2400 python tools/ab_decisions.py

# 4 — sketch microbench (honest insert/query rate).
stage sketch_bench timeout 1200 python -m cafe_tpu.tools.sketch_bench \
    --stream_len 2000000 --vocab 500000 --buckets 65536 --cells 4 \
    --batch 53248 --threshold 500

# 5 — roofline fractions for the fused path (north-star evidence).
stage roofline timeout 1200 python -m cafe_tpu.tools.roofline

# 6 — CriteoTB-scale CAFE+ reset cost (r3 item 6 final close-out).
stage reset_cost timeout 1200 python tools/reset_cost.py \
    --lim 1000000 --batch 53248

# 7 — landing-implementation A/B + pallas kernel checks (added after
#     the one-pass landing kernel landed mid-round).
stage ab_insert_land timeout 2400 python tools/ab_insert_land.py
stage pallas_land_check timeout 1200 python tools/pallas_land_check.py
stage ab_apply128 timeout 1200 python tools/ab_apply128.py
stage pallas_a2a_smoke timeout 900 python tools/pallas_a2a_smoke.py

# 8 — serving protocol: fp32 vs int8 test ms/it at batch 16384.
stage serving_bench timeout 2400 python tools/serving_bench.py \
    --out "$OUT/serving_bench.jsonl"

# 9 — the headline (runs last so every kernel above is warm-validated).
stage bench timeout 1800 python bench.py

log "queue done — artifacts in $OUT"
