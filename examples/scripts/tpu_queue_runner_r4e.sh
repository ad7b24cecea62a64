#!/bin/bash
# Fifth TPU bench wave (round 4, part e): re-runs the int8 conv primitive
# probe with value-fetch timing: on this tunneled backend block_until_ready
# resolves at enqueue, so timed calls must fetch the result (float(...)).
# Waits for the part-d runner to release the chip.
cd "$(dirname "$0")/../.."
LOG=runs/queue_r4e.log
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -f /tmp/queue_r4d.pid ]; then
  PIDD=$(cat /tmp/queue_r4d.pid)
  while [ -d "/proc/$PIDD" ]; do
    say "waiting for part-d queue (pid $PIDD) to finish"
    sleep 180
  done
fi
say "=== r4e queue start ==="

wait_for_tpu() {
  for i in $(seq 1 100); do
    if timeout 70 python bench.py --probe 2>/dev/null | grep -q PROBE_OK; then
      return 0
    fi
    say "probe failed (attempt $i) — tunnel down, sleeping 120s"
    sleep 120
  done
  return 1
}

run_job() {
  art=$1; budget=$2; shift 2
  if [ -s "$art" ]; then say "SKIP (exists): $art"; return 0; fi
  for try in 1 2 3; do
    wait_for_tpu || { say "GIVE UP waiting for TPU"; return 1; }
    say "RUN (try $try, ${budget}s): $*"
    if timeout "$budget" "$@" >>"$LOG" 2>&1 && [ -s "$art" ]; then
      say "OK: $art"; return 0
    fi
    say "FAILED try $try: $* (artifact: $art)"
    sleep 30
  done
  say "JOB FAILED after 3 tries: $*"
  return 1
}

# 1) int8 conv primitive probe, jitter-proof timing
run_job runs/bench_int8_micro.json 2400 python examples/scripts/bench_int8_micro.py

say "=== r4e queue done ==="
