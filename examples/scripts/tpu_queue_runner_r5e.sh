#!/usr/bin/env bash
# r5e: re-run the two jobs the r5b/r5d queues left dead:
#  1. floor192  — RT-DETR committed-floor retrain at a DETR-viable 192px
#                 (r5b attempt failed on a relative-out dataset-path bug,
#                 fixed in train_floor.py by resolving --out)
#  2. int8auto  — selective-int8 scale ladder A/B (nn/quant.py int8_wins),
#                 the r5d queue never got to run before the session ended
set -u
cd "$(dirname "$0")/../.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
LOG=runs/queue_r5e.log
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
  scratch=$(mktemp "/tmp/queue_r5e_${name}.XXXXXX")
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

run_job floor192 runs/floor_rtdetr_192/floor.json 9000 \
  python -c "import sys; sys.path.insert(0, 'examples/scripts'); import train_floor; train_floor.main('rtdetr', 300, 192, 64, out='runs/floor_rtdetr_192')"
run_job int8auto runs/bench_int8auto_scales.json 5400 \
  python examples/scripts/bench_scales.py --int8auto --out runs/bench_int8auto_scales.json \
  yolov8n-seg yolov8s-seg yolov8m-seg yolov8l-seg
echo "$(date -u +%H:%M:%S) QUEUE DONE" >> "$LOG"
