#!/usr/bin/env bash
# r5c: training-augment wave (VERDICT r4 next-#2), chained after the r5b
# RT-DETR ladder so the two never contend for the single tunneled chip.
#
# Jobs:
#  1. prof_aug   — per-op attribution of the augment stage (the r5 run
#                  failed on a signature bug, fixed in profile_augment.py)
#  2. e2e_train  — re-measure after the rank-1 coverage warp (the ones-plane
#                  second resample was ~25% of the warp FLOPs)
set -u
cd "$(dirname "$0")/../.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
LOG=runs/queue_r5c.log
: > "$LOG"

# wait for the r5b ladder to release the chip (max ~5h)
for i in $(seq 1 150); do
  grep -q "QUEUE DONE" runs/queue_r5b.log 2>/dev/null && break
  sleep 120
done
grep -q "QUEUE DONE" runs/queue_r5b.log 2>/dev/null || {
  echo "r5b queue never finished — running anyway" >> "$LOG"; }

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
  scratch=$(mktemp "/tmp/queue_r5c_${name}.XXXXXX")
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

run_job prof_aug  runs/profile_augment.json 1800 \
  python examples/scripts/profile_augment.py 16 640 30
run_job e2e_train runs/e2e_train_r5c.json   3600 \
  env E2E_OUT=runs/e2e_train_r5c.json python examples/scripts/bench_e2e_train.py
echo "$(date -u +%H:%M:%S) QUEUE DONE" >> "$LOG"
