#!/bin/bash
# Watch for the TPU tunnel to come back, then run the round-3 honest-clock
# re-measurement sequence (tools/remeasure_tpu.sh) exactly once.
# Run from the repo root WITHOUT PYTHONPATH.
set -u
cd /root/repo
OUT=docs/r3_measurements
mkdir -p "$OUT"
STAMP="$OUT/.remeasure_started"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/watch.log"; }

log "tunnel watch started (pid $$)"
while true; do
  if [ -f "$STAMP" ]; then
    log "remeasure already started; exiting watch"
    exit 0
  fi
  if timeout 120 python -c "import jax; d=jax.devices(); assert d and d[0].platform=='tpu'" >/dev/null 2>&1; then
    log "tunnel is UP — launching remeasure_tpu.sh"
    touch "$STAMP"
    bash tools/remeasure_tpu.sh "$OUT" >> "$OUT/watch.log" 2>&1
    log "remeasure sequence finished"
    exit 0
  fi
  log "tunnel still down"
  sleep 240
done
