#!/usr/bin/env bash
# r5f: e2e-training measurement wave (chained after r5e):
#  1. prof_aug    — per-op attribution of the device augment at TRAIN shapes
#                   (the committed artifact was a CPU fallback at toy shapes;
#                   delete it so the job re-measures on chip)
#  2. e2e_train   — bench_e2e_train with the new prebatch_augment A/B rows
#  3. diag_b16/64 — aug-vs-noaug step decomposition at both batch sizes
#                   (gives the honest pure-step denominators)
set -u
cd "$(dirname "$0")/../.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
LOG=runs/queue_r5f.log
: > "$LOG"

for i in $(seq 1 200); do
  grep -q "QUEUE DONE" runs/queue_r5e.log 2>/dev/null && break
  sleep 120
done
grep -q "QUEUE DONE" runs/queue_r5e.log 2>/dev/null || {
  echo "r5e queue never finished — running anyway" >> "$LOG"; }

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
  scratch=$(mktemp "/tmp/queue_r5f_${name}.XXXXXX")
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

# the committed profile_augment.json was a CPU-fallback junk run (batch 2,
# imgsz 64) that made every later queue SKIP the job — remeasure for real
rm -f runs/profile_augment.json
run_job prof_aug  runs/profile_augment.json 2400 \
  python examples/scripts/profile_augment.py 16 640 30
run_job e2e_train runs/e2e_train_r5f.json   5400 \
  env E2E_OUT=runs/e2e_train_r5f.json python examples/scripts/bench_e2e_train.py
run_job diag_b16  runs/e2e_diag_r5f_b16.json 2400 \
  env E2E_DIAG_OUT=e2e_diag_r5f_b16.json python examples/scripts/diag_e2e_train.py 640 16 8
run_job diag_b64  runs/e2e_diag_r5f_b64.json 2400 \
  env E2E_DIAG_OUT=e2e_diag_r5f_b64.json python examples/scripts/diag_e2e_train.py 640 64 8
echo "$(date -u +%H:%M:%S) QUEUE DONE" >> "$LOG"
