#!/bin/bash
# Round-4 chip measurement queue (sequential — the tunnel serializes
# anyway and concurrent runs poison each other's windows).
#   bash tools/remeasure_r4.sh [outdir]
set -u
OUT=${1:-docs/r4_measurements}
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/run.log"; }

log "1/5 step breakdown dim 16 (post-optimization stage budget)"
timeout 1200 python tools/step_breakdown.py 2>&1 | tee "$OUT/step_breakdown.txt"

log "2/5 latency grid (CriteoTB dim-128 protocol, 5 methods)"
timeout 2400 python tools/latency_grid.py \
    --boards "$OUT/latency_boards" 2>&1 | tee "$OUT/latency_grid.txt"

log "3/5 perf-decision A/Bs"
timeout 2400 python tools/ab_decisions.py 2>&1 | tee "$OUT/ab_decisions.txt"

log "4/5 sketch microbench (honest insert/query rate)"
timeout 1200 python -m cafe_tpu.tools.sketch_bench \
    --stream_len 2000000 --vocab 500000 --buckets 65536 --cells 4 \
    --batch 53248 --threshold 500 2>&1 | tee "$OUT/sketch_bench.txt"

log "5/5 roofline fractions"
timeout 1200 python -m cafe_tpu.tools.roofline 2>&1 | tee "$OUT/roofline.txt"

log "done — artifacts in $OUT"
