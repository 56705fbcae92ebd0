#!/bin/bash
# Watch for the TPU tunnel to come back, then run the round-3 honest-clock
# re-measurement sequence (tools/remeasure_tpu.sh) until it has succeeded
# once. Safe to relaunch; concurrent runs are prevented by a pid-guarded
# lock, and a FAILED sequence (tunnel dropping mid-run) is retried on the
# next tunnel-up, not abandoned.
set -u
cd "$(dirname "$0")/.."
OUT=docs/r3_measurements
mkdir -p "$OUT"
DONE="$OUT/.remeasure_done"
LOCK="$OUT/.remeasure_lock"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/watch.log"; }

probe() {
  # PYTHONPATH breaks axon TPU backend registration (project memory);
  # strip it for the probe AND the measurement run
  timeout 120 env -u PYTHONPATH python -c \
    "import jax; d=jax.devices(); assert d and d[0].platform=='tpu'" \
    >/dev/null 2>&1
}

sequence_ok() {
  # success = the clock probe produced rates AND bench emitted a real
  # JSON line (no error field, nonzero value)
  grep -q "TFLOP/s" "$OUT/clock_probe.txt" 2>/dev/null \
    && grep -q '"metric"' "$OUT/bench.txt" 2>/dev/null \
    && ! grep -q '"error"' "$OUT/bench.txt" 2>/dev/null
}

if [ -f "$DONE" ]; then
  log "remeasure already completed; exiting watch"
  exit 0
fi
if [ -f "$LOCK" ] && kill -0 "$(cat "$LOCK" 2>/dev/null)" 2>/dev/null; then
  log "another watch (pid $(cat "$LOCK")) is live; exiting"
  exit 0
fi
echo $$ > "$LOCK"
log "tunnel watch started (pid $$)"
while true; do
  if probe; then
    # stop the CPU insurance grid (if one is running) so its host-side
    # load can't bias the chip window's measurements; exact-PID kill
    IPID_FILE="$OUT/.cpu_insurance_pid"
    if [ -f "$IPID_FILE" ]; then
      IPID=$(cat "$IPID_FILE" 2>/dev/null)
      if [ -n "$IPID" ] && kill -0 "$IPID" 2>/dev/null; then
        kill "$IPID" && log "killed CPU insurance grid (pid $IPID)"
      fi
      rm -f "$IPID_FILE"
    fi
    log "tunnel is UP — launching remeasure_tpu.sh"
    env -u PYTHONPATH bash tools/remeasure_tpu.sh "$OUT" \
      >> "$OUT/watch.log" 2>&1
    if sequence_ok; then
      log "remeasure sequence SUCCEEDED"
      touch "$DONE"
      rm -f "$LOCK"
      exit 0
    fi
    log "remeasure sequence FAILED/incomplete; will retry when tunnel is up"
    sleep 300
  else
    log "tunnel still down"
    sleep 240
  fi
done
