#!/bin/bash
# Round-3 honest-clock re-measurement sequence (runs unattended once the
# TPU tunnel is reachable). Run from the repo root WITHOUT PYTHONPATH.
#
#   bash tools/remeasure_tpu.sh [outdir]
#
# Order matters: the clock probe validates the fence FIRST; everything
# after it is only meaningful if the probe reads <= the chip's bf16 peak.
set -u
OUT=${1:-docs/r3_measurements}
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/run.log"; }

log "1/9 clock probe (known-FLOPs matmul chain; must read <= ~197 TFLOP/s)"
timeout 1200 python tools/clock_probe.py 2>&1 | tee "$OUT/clock_probe.txt"

log "2/9 bench.py (value-fetch fence + MFU guard)"
timeout 1800 python bench.py 2>&1 | tee "$OUT/bench.txt"

log "3/9 step breakdown dim 16 (stage budget, honest fence)"
timeout 1800 python tools/step_breakdown.py 2>&1 | tee "$OUT/step_breakdown.txt"

log "4/9 step breakdown dim 128 (criteotb latency shapes)"
timeout 1800 python tools/step_breakdown.py --shapes criteotb 2>&1 \
    | tee "$OUT/step_breakdown_128.txt"

log "5/9 round-2 perf-decision A/Bs (donate, migration cap, sortless, pallas)"
timeout 3600 python tools/ab_decisions.py 2>&1 | tee "$OUT/ab_decisions.txt"

log "6/9 sketch microbench (recall/drift + honest insert/query rate)"
timeout 1800 python -m cafe_tpu.tools.sketch_bench \
    --stream_len 2000000 --vocab 500000 --buckets 65536 --cells 4 \
    --batch 53248 --threshold 500 2>&1 | tee "$OUT/sketch_bench.txt"

log "7/9 roofline fractions"
timeout 1800 python -m cafe_tpu.tools.roofline 2>&1 | tee "$OUT/roofline.txt"

log "8/9 Criteo-scale grid (real vocabularies, gap-to-ideal label model)"
timeout 14000 python -m cafe_tpu.tools.criteo_grid \
    --rows 4194304 --epochs 2 \
    --methods full hash cafe off \
    --out docs/criteo_grid_r3.jsonl 2>&1 | tee "$OUT/grid.txt"

log "9/9 profile trace of the bench step (stage budget for the MFU work)"
timeout 1800 python tools/profile_step.py --out "$OUT/profile" 2>&1 \
    | tee "$OUT/profile_top.txt"

python tools/perf_report.py "$OUT" > /dev/null 2>&1 && \
    log "digest written to $OUT/SUMMARY.md"

log "done — artifacts in $OUT"
