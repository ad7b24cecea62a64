#!/bin/bash
# TPU bench queue — run SOLO (no pytest, no second python, quiet host) on a
# working tunnel. Each job is independently resumable; artifacts land in
# runs/ and are read by the committed docs/tests.
#
# Context: this session's perf work (lazy polar decode, multi-step dispatch,
# grouped val, int8 path) landed with CPU-only validation because the TPU
# tunnel died mid-round (see docs/PERF_NOTES.md); this queue re-measures
# everything on-chip.
set -e
cd "$(dirname "$0")/../.."

run() { echo "=== $* ==="; timeout "${T:-3600}" "$@" || echo "JOB FAILED: $*"; }

# 1) deploy-pipeline A/B: lazy decode stage vs the old full decode
T=2400 run python examples/scripts/bench_ablate.py 64 128 256

# 2) headline bench (lazy decode) + int8 variant + s/m scales
T=1800 run python bench.py
T=1800 run env BENCH_INT8=1 python bench.py
T=3600 run python examples/scripts/bench_scales.py

# 3) e2e training throughput: steps_per_dispatch rows (expect the device/scan
#    row to go from ~25 to hundreds of img/s — dispatch-latency amortization)
T=3600 run python examples/scripts/bench_e2e_train.py

# 4) RT-DETR quality floor (auction matcher) — ~15 min compile + ~15 min run
T=5400 run python examples/scripts/train_floor.py rtdetr 300 96 64

# 5) serving-engine load curve (dynamic batcher vs bench.py's in-graph ceiling)
T=3600 run python examples/scripts/bench_serve.py yolov8n-seg.yaml 640 10
