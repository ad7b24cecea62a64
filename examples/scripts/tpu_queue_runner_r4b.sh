#!/bin/bash
# Follow-on TPU bench queue (round 4, part b): re-measures after the
# separable-warp augmentation and the serving-latency fixes landed. Waits
# for the part-a runner (RT-DETR floor + scale ladder) to release the chip,
# then runs with the same probe/retry/skip discipline as tpu_queue_runner.sh.
cd "$(dirname "$0")/../.."
LOG=runs/queue_r4b.log
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

# hand-off: wait for the part-a queue (pid file) to exit before touching
# the chip — two TPU clients cannot share the tunnel
if [ -f /tmp/queue_r4.pid ]; then
  PIDA=$(cat /tmp/queue_r4.pid)
  while [ -d "/proc/$PIDA" ]; do
    say "waiting for part-a queue (pid $PIDA) to finish"
    sleep 180
  done
fi
say "=== r4b queue start ==="

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

# 1) e2e training throughput with the separable matmul warp (the gather-warp
#    augment was ~740 ms/step — the whole e2e gap vs the 585 img/s pure step)
run_job runs/e2e_train_r4b.json 3600 \
  bash -c 'python examples/scripts/bench_e2e_train.py && cp runs/e2e_train_bench.json runs/e2e_train_r4b.json'

# 2) augment-cost diagnostic after the warp change (same methodology as r4a)
run_job runs/e2e_diag_r4b.json 3600 \
  env E2E_DIAG_OUT=e2e_diag_r4b.json python examples/scripts/diag_e2e_train.py

# 3) serving load curve after lazy masks + u8 upload + pipelined dispatch
run_job runs/serve_bench_r4b.json 3600 \
  bash -c 'python examples/scripts/bench_serve.py yolov8n-seg.yaml 640 10 && cp runs/serve_bench.json runs/serve_bench_r4b.json'

# 4) headline after the logit-ranking NMS change (sigmoid after reduce)
run_job runs/bench_headline_r4b.json 900 \
  bash -c 'BENCH_BATCH=128 python bench.py > /tmp/bench_out.txt && tail -1 /tmp/bench_out.txt > runs/bench_headline_r4b.json'

# 5) stage ablation at batch 128 post-logits (decode stage shrinks?)
run_job runs/bench_ablate_r4b.json 2400 \
  bash -c 'python examples/scripts/bench_ablate.py 128 && cp runs/bench_ablate.json runs/bench_ablate_r4b.json'

# 6) int8 conv primitive probe: does XLA:TPU run s8xs8->s32 at the 2x rate?
run_job runs/bench_int8_micro.json 1800 python examples/scripts/bench_int8_micro.py

# 7) RT-DETR quality floor, now viable: save_last_every=25 removes the
#    ~51s/epoch checkpoint-readback stall that timed out three r4a tries
#    (300 epochs of real 1.6s + ~25 best-saves ~= 35-60 min)
run_job runs/floor_rtdetr/floor.json 7200 \
  python examples/scripts/train_floor.py rtdetr 300 96 64

# 8) per-op attribution of the fused deploy pipeline (where do the 4.3 ms
#    of decode+NMS actually go: concat? top_k? reduces?)
run_job runs/profile_pipeline.json 1800 python examples/scripts/profile_pipeline.py 128 20

say "=== r4b queue done ==="
