#!/usr/bin/env bash
# r5 measurement queue. Fixes the r4g advisor findings:
#  - artifacts are validated as JSON before a job is marked done (not just -s)
#  - each job writes its OWN artifact path (no shared tracked file mutated)
#  - a dead tunnel aborts the whole queue instead of re-probing for hours
#  - scratch files come from mktemp, not fixed /tmp names
#  - the compilation cache dir derives from the resolved repo root
set -u
cd "$(dirname "$0")/../.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
LOG=runs/queue_r5.log
: > "$LOG"

wait_for_tpu() {
  for i in $(seq 1 20); do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "$(date -u +%H:%M:%S) tpu probe $i/20 failed; sleeping 120s" >> "$LOG"
    sleep 120
  done
  echo "$(date -u +%H:%M:%S) TUNNEL DEAD — aborting queue" >> "$LOG"
  exit 3
}

run_job() {  # name artifact timeout cmd...
  local name="$1" art="$2" to="$3"; shift 3
  if [ -s "$art" ] && python -c "import json,sys;json.load(open(sys.argv[1]))" "$art" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) SKIP $name (valid artifact exists)" >> "$LOG"
    return 0
  fi
  wait_for_tpu
  local scratch
  scratch=$(mktemp "/tmp/queue_r5_${name}.XXXXXX")
  echo "$(date -u +%H:%M:%S) RUN  $name" >> "$LOG"
  timeout "$to" "$@" > "$scratch" 2>&1
  local rc=$?
  if [ $rc -eq 0 ] && [ -s "$art" ] && \
     python -c "import json,sys;json.load(open(sys.argv[1]))" "$art" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) OK   $name -> $art" >> "$LOG"
  else
    echo "$(date -u +%H:%M:%S) FAIL $name rc=$rc (tail: $(tail -c 300 "$scratch" | tr '\n' ' '))" >> "$LOG"
  fi
  rm -f "$scratch"
}

run_job int8_micro  runs/bench_int8_micro.json   1800 python examples/scripts/bench_int8_micro.py
run_job int8_scales runs/bench_int8_scales.json  5400 python examples/scripts/bench_scales.py --int8 yolov8n-seg yolov8s-seg yolov8m-seg yolov8l-seg
run_job b256        runs/bench_headline_b256.json 1800 sh -c 'BENCH_BATCH=256 python bench.py | tail -1 > runs/bench_headline_b256.json'
run_job prof_aug    runs/profile_augment.json     1800 python examples/scripts/profile_augment.py 16 640 30
run_job e2e_train   runs/e2e_train_r5.json        3600 env E2E_OUT=runs/e2e_train_r5.json python examples/scripts/bench_e2e_train.py
run_job val_ratio   runs/val_maskratio_r5.json    2400 python examples/scripts/bench_val_maskratio.py
echo "$(date -u +%H:%M:%S) QUEUE DONE" >> "$LOG"
