#!/bin/bash
# Self-healing TPU bench queue (round 4). The tunnel to the single TPU chip
# dies unpredictably (see docs/PERF_NOTES.md r3), so unlike bench_queue_r4.sh
# this runner PROBES before every job, retries each job up to 3 times across
# outages, and skips jobs whose artifact already exists. Run SOLO in the
# background; progress goes to runs/queue_r4.log.
cd "$(dirname "$0")/../.."
LOG=runs/queue_r4.log
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

wait_for_tpu() {
  for i in $(seq 1 200); do
    if timeout 70 python bench.py --probe 2>/dev/null | grep -q PROBE_OK; then
      return 0
    fi
    say "probe failed (attempt $i) — tunnel down, sleeping 120s"
    sleep 120
  done
  return 1
}

# run_job <artifact> <budget_s> <cmd...>: skip if artifact exists, else up to
# 3 probe+run attempts.
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

say "=== queue start ==="

# 1) ablation with the r4 parts-pipeline stage (decides the headline config)
run_job runs/bench_ablate_parts.json 2700 \
  bash -c 'python examples/scripts/bench_ablate.py 128 256 && cp runs/bench_ablate.json runs/bench_ablate_parts.json'

# 2) headline bench @128, parts pipeline (bench.py default)
run_job runs/bench_headline_r4.json 900 \
  bash -c 'BENCH_BATCH=128 python bench.py | tail -1 > runs/bench_headline_r4.json'

# 3) int8 variant @128 on the parts pipeline — MFU vs the 394-TOPS int8 peak
run_job runs/bench_int8_r4.json 1200 \
  bash -c 'BENCH_INT8=1 BENCH_BATCH=128 python bench.py | tail -1 > runs/bench_int8_r4.json'

# 4) decompose the 650 ms/step e2e-train cost (PERF_NOTES r4 finding)
run_job runs/e2e_diag.json 3600 python examples/scripts/diag_e2e_train.py

# 5) e2e training throughput incl. steps_per_dispatch rows
run_job runs/e2e_train_bench.json 3600 python examples/scripts/bench_e2e_train.py

# 6) serving-engine load curve
run_job runs/serve_bench.json 3600 python examples/scripts/bench_serve.py yolov8n-seg.yaml 640 10

# 7) RT-DETR quality floor
run_job runs/floor_rtdetr/floor.json 9000 \
  python examples/scripts/train_floor.py rtdetr 300 96 64

# 8) scale ladder n/s/m/l/x (rewrites bench_scales.json with the l/x rows)
run_job runs/bench_scales_r4.json 5400 \
  bash -c 'python examples/scripts/bench_scales.py && cp runs/bench_scales.json runs/bench_scales_r4.json'

say "=== queue done ==="
