#!/bin/bash
# Fourth TPU bench wave (round 4, part d): measures the filter-before-decode
# (topk) deploy path on chip — stage ablation at batch 128/256 and the
# headline/int8 benches with BENCH_PIPE=topk. Waits for the part-c runner.
cd "$(dirname "$0")/../.."
LOG=runs/queue_r4d.log
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -f /tmp/queue_r4c.pid ]; then
  PIDC=$(cat /tmp/queue_r4c.pid)
  while [ -d "/proc/$PIDC" ]; do
    say "waiting for part-c queue (pid $PIDC) to finish"
    sleep 120
  done
fi
say "=== r4d queue start ==="

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

# 1) stage ablation incl. +nms(topk), batch 128 and 256
run_job runs/bench_ablate_topk.json 3000 \
  bash -c 'python examples/scripts/bench_ablate.py 128 256 && cp runs/bench_ablate.json runs/bench_ablate_topk.json'

# 2) headline with the topk pipeline
run_job runs/bench_headline_topk.json 900 \
  bash -c 'BENCH_PIPE=topk BENCH_BATCH=128 python bench.py > /tmp/bench_topk.txt && tail -1 /tmp/bench_topk.txt > runs/bench_headline_topk.json'

# 3) native int8 + topk pipeline (the two compose: int8 convs, lean decode)
run_job runs/bench_int8_topk.json 1200 \
  bash -c 'BENCH_INT8=1 BENCH_PIPE=topk BENCH_BATCH=128 python bench.py > /tmp/bench_int8_topk.txt && tail -1 /tmp/bench_int8_topk.txt > runs/bench_int8_topk.json'

say "=== r4d queue done ==="
