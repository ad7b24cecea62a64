#!/usr/bin/env bash
# r5g (chained after r5f): clean selective-int8 ladder re-run — the r5d
# runner's 17:30 measurement overlapped the floor192 training job on the
# same chip; re-measure on a quiet chip and compare.
set -u
cd "$(dirname "$0")/../.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
LOG=runs/queue_r5g.log
: > "$LOG"

for i in $(seq 1 200); do
  grep -q "QUEUE DONE" runs/queue_r5f.log 2>/dev/null && break
  sleep 120
done
grep -q "QUEUE DONE" runs/queue_r5f.log 2>/dev/null || {
  echo "r5f queue never finished — running anyway" >> "$LOG"; }

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
  scratch=$(mktemp "/tmp/queue_r5g_${name}.XXXXXX")
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

run_job int8auto runs/bench_int8auto_scales_clean.json 5400 \
  python examples/scripts/bench_scales.py --int8auto --out runs/bench_int8auto_scales_clean.json \
  yolov8n-seg yolov8s-seg yolov8m-seg yolov8l-seg
echo "$(date -u +%H:%M:%S) QUEUE DONE" >> "$LOG"
