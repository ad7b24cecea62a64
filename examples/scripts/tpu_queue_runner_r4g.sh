#!/bin/bash
# Seventh TPU bench wave (round 4, part g): wall-clock-prioritized re-order of
# the r4d/r4e/r4f jobs. Headline candidates first (they decide bench.py's
# default config for the driver's end-of-round BENCH run), composition and
# diagnostics after. Each job skips if its artifact already exists.
cd "$(dirname "$0")/../.."
LOG=runs/queue_r4g.log
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
say "=== r4g queue start ==="

wait_for_tpu() {
  for i in $(seq 1 20); do
    if timeout 70 python bench.py --probe 2>/dev/null | grep -q PROBE_OK; then
      return 0
    fi
    say "probe failed (attempt $i) — tunnel down, sleeping 60s"
    sleep 60
  done
  return 1
}

run_job() {
  art=$1; budget=$2; shift 2
  if [ -s "$art" ]; then say "SKIP (exists): $art"; return 0; fi
  for try in 1 2; do
    wait_for_tpu || { say "GIVE UP waiting for TPU"; return 1; }
    say "RUN (try $try, ${budget}s): $*"
    if timeout "$budget" "$@" >>"$LOG" 2>&1 && [ -s "$art" ]; then
      say "OK: $art"; return 0
    fi
    say "FAILED try $try: $* (artifact: $art)"
    sleep 15
  done
  say "JOB FAILED after 2 tries: $*"
  return 1
}

# 1) headline with the topk (filter-before-decode) pipeline
run_job runs/bench_headline_topk.json 900 \
  bash -c 'BENCH_PIPE=topk BENCH_BATCH=128 python bench.py > /tmp/b0.txt && tail -1 /tmp/b0.txt > runs/bench_headline_topk.json'

# 2) headline: topk + folded normalize
run_job runs/bench_headline_topk_fold.json 900 \
  bash -c 'BENCH_PIPE=topk BENCH_FOLD_PRE=1 BENCH_BATCH=128 python bench.py > /tmp/b1.txt && tail -1 /tmp/b1.txt > runs/bench_headline_topk_fold.json'

# 3) int8 composed with topk + fold
run_job runs/bench_int8_topk_fold.json 1200 \
  bash -c 'BENCH_INT8=1 BENCH_PIPE=topk BENCH_FOLD_PRE=1 BENCH_BATCH=128 python bench.py > /tmp/b2.txt && tail -1 /tmp/b2.txt > runs/bench_int8_topk_fold.json'

# 4) batch-256 row on the best bf16 config (the old HBM-cliff check)
run_job runs/bench_headline_topk_fold_b256.json 900 \
  bash -c 'BENCH_PIPE=topk BENCH_FOLD_PRE=1 BENCH_BATCH=256 python bench.py > /tmp/b3.txt && tail -1 /tmp/b3.txt > runs/bench_headline_topk_fold_b256.json'

# 5) stage ablation incl. +nms(topk), batch 128 only (256 covered by job 4)
run_job runs/bench_ablate_topk.json 1800 \
  bash -c 'python examples/scripts/bench_ablate.py 128 && cp runs/bench_ablate.json runs/bench_ablate_topk.json'

# 6) int8 conv primitive probe, jitter-proof timing
run_job runs/bench_int8_micro.json 2400 python examples/scripts/bench_int8_micro.py

say "=== r4g queue done ==="
