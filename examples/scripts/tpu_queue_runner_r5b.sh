#!/usr/bin/env bash
# r5b: RT-DETR diagnosis ladder (VERDICT r4 next-#3), chained after the r5
# measurement queue so the two never contend for the single tunneled chip.
#
# Evidence so far (runs/probe_rtdetr_match.json): the in-graph auction
# matcher is EXACT vs the scipy oracle on real training cost matrices, and
# the best-achievable query IoU after 600 overfit epochs is only ~0.69 —
# localization, not matching, is the limiter. At imgsz 96 the decoder sees
# 12x12/6x6/3x3 feature maps (189 tokens for 300 queries); the hypothesis is
# resolution starvation, which the reference never hits (it trains RT-DETR at
# 640). The ladder separates resolution vs augmentation vs step budget, then
# re-trains the committed floor at a DETR-viable resolution.
set -u
cd "$(dirname "$0")/../.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
LOG=runs/queue_r5b.log
: > "$LOG"

# wait for the r5 queue to release the chip (max ~5h)
for i in $(seq 1 150); do
  grep -q "QUEUE DONE" runs/queue_r5.log 2>/dev/null && break
  sleep 120
done
grep -q "QUEUE DONE" runs/queue_r5.log 2>/dev/null || {
  echo "r5 queue never finished — running anyway" >> "$LOG"; }

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
  scratch=$(mktemp "/tmp/queue_r5b_${name}.XXXXXX")
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

# 1. resolution hypothesis: same budget-class overfit at 192px (24x24 top map)
run_job overfit192 runs/diag_rtdetr_overfit_192.json 5400 \
  python examples/scripts/diag_rtdetr_overfit.py 1200 192 2e-4 192
# 2. augmentation control: 96px with all augmentation off
run_job overfit96na runs/diag_rtdetr_overfit_96noaug.json 3600 \
  python examples/scripts/diag_rtdetr_overfit.py 1200 96 2e-4 96noaug --noaug
# 3. committed floor re-train at a DETR-viable resolution (300 epochs as r4).
# Writes a FRESH dir — the tracked runs/floor_rtdetr is only replaced by hand
# after the result is reviewed (advisor r4: never mutate a tracked artifact
# as a job side effect).
run_job floor192 runs/floor_rtdetr_192/floor.json 9000 \
  python -c "import sys; sys.path.insert(0, 'examples/scripts'); import train_floor; train_floor.main('rtdetr', 300, 192, 64, out='runs/floor_rtdetr_192')"
echo "$(date -u +%H:%M:%S) QUEUE DONE" >> "$LOG"
