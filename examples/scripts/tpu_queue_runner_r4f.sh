#!/bin/bash
# Sixth TPU bench wave (round 4, part f): A/B the stem-folded normalize
# (BENCH_FOLD_PRE) on top of the topk pipeline, alone and composed with
# native int8, plus a batch-256 row. Waits for the part-e runner.
cd "$(dirname "$0")/../.."
LOG=runs/queue_r4f.log
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -f /tmp/queue_r4e.pid ]; then
  PIDE=$(cat /tmp/queue_r4e.pid)
  while [ -d "/proc/$PIDE" ]; do
    say "waiting for part-e queue (pid $PIDE) to finish"
    sleep 120
  done
fi
say "=== r4f queue start ==="

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

# 1) headline: topk + folded normalize
run_job runs/bench_headline_topk_fold.json 900 \
  bash -c 'BENCH_PIPE=topk BENCH_FOLD_PRE=1 BENCH_BATCH=128 python bench.py > /tmp/b1.txt && tail -1 /tmp/b1.txt > runs/bench_headline_topk_fold.json'

# 2) int8 composed with topk + fold
run_job runs/bench_int8_topk_fold.json 1200 \
  bash -c 'BENCH_INT8=1 BENCH_PIPE=topk BENCH_FOLD_PRE=1 BENCH_BATCH=128 python bench.py > /tmp/b2.txt && tail -1 /tmp/b2.txt > runs/bench_int8_topk_fold.json'

# 3) batch-256 row on the best bf16 config (the old HBM-cliff check)
run_job runs/bench_headline_topk_fold_b256.json 900 \
  bash -c 'BENCH_PIPE=topk BENCH_FOLD_PRE=1 BENCH_BATCH=256 python bench.py > /tmp/b3.txt && tail -1 /tmp/b3.txt > runs/bench_headline_topk_fold_b256.json'

say "=== r4f queue done ==="
