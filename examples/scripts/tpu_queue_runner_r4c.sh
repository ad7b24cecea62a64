#!/bin/bash
# Third TPU bench wave (round 4, part c): re-runs the int8 conv primitive
# probe with jitter-proof timing (300 in-graph iterations, median of 5
# long-minus-short pairs — the 30-iteration version measured tunnel RTT
# noise, not compute). Waits for the part-b runner to release the chip.
cd "$(dirname "$0")/../.."
LOG=runs/queue_r4c.log
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -f /tmp/queue_r4b.pid ]; then
  PIDB=$(cat /tmp/queue_r4b.pid)
  while [ -d "/proc/$PIDB" ]; do
    say "waiting for part-b queue (pid $PIDB) to finish"
    sleep 180
  done
fi
say "=== r4c queue start ==="

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

say "=== r4c queue done ==="
