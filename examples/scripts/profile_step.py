"""Per-op attribution of the fused train step (segment vs detect).

The scan-form bench (runs/train_bench_scan.json) measured DETECT slower
than polar-seg per training step (46.8 vs 38.3 ms at b16/640) even though
the detect model has fewer forward FLOPs — this traces one K-step scan of
each task's production program and aggregates device op time, to name the
ops responsible. Usage: python examples/scripts/profile_step.py [task] [B]
Writes runs/profile_step_<task>_b<B>.json.
"""
import glob
import gzip
import json
import math
import sys
from collections import defaultdict
from pathlib import Path
from types import SimpleNamespace

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import numpy as np


def main(task="detect", B=16, imgsz=640, K=8):
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.engine.step import (
        init_train_state,
        make_multi_train_step,
    )
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.optim import build_optimizer

    hyp = SimpleNamespace(
        lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
        warmup_epochs=0.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
        box=7.5, cls=0.5, dfl=1.5, epochs=1, optimizer="SGD", cos_lr=False,
        batch=B, nbs=B, nc=2,
    )
    yaml_name = "yolov8-seg.yaml" if task == "segment" else "yolov8.yaml"
    model = build_model(
        str(ROOT / "yolo_contour_regression_tpu/cfg/models" / yaml_name),
        nc=2, dtype=jnp.bfloat16,
    )
    variables = model.init(imgsz=imgsz)
    tx = build_optimizer(variables["params"], hyp, steps_per_epoch=K, iterations=K * 8)
    rng = np.random.default_rng(0)
    nmax, n_real = 16, 8
    images = jnp.asarray(rng.uniform(0, 1, (K, B, imgsz, imgsz, 3)).astype(np.float32))
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    side = int(math.ceil(math.sqrt(n_real)))
    cxs = (np.arange(nmax) % side + 0.5) / side
    cys = (np.arange(nmax) // side + 0.5) / side % 1.0
    r = 0.3 / side
    segs = np.stack([
        np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], -1)
        for cx, cy in zip(cxs, cys)
    ]).astype(np.float32)
    mask = np.zeros((K, B, nmax), bool)
    mask[..., :n_real] = True
    labels = {
        "cls": jnp.zeros((K, B, nmax), jnp.int32),
        "bboxes": jnp.asarray(np.tile(
            np.stack([cxs, cys, np.full(nmax, 2 * r), np.full(nmax, 2 * r)],
                     -1).astype(np.float32), (K, B, 1, 1))),
        "segments": jnp.asarray(np.tile(segs, (K, B, 1, 1, 1))),
        "mask_gt": jnp.asarray(mask),
    }
    multi_fn = make_multi_train_step(model, tx, hyp, cand=128, donate=False,
                                     augment_fn=None, from_pool=False)
    state = init_train_state(variables, tx)
    state, m = multi_fn(state, images, labels)
    float(np.asarray(m["loss"])[-1])  # compile + settle

    tdir = ROOT / "runs" / f"profile_step_{task}_trace"
    with jax.profiler.trace(str(tdir)):
        for _ in range(3):
            state, m = multi_fn(state, images, labels)
        float(np.asarray(m["loss"])[-1])

    traces = sorted(glob.glob(str(tdir / "**" / "*.trace.json.gz"), recursive=True))
    agg = defaultdict(float)
    total = 0.0
    if traces:
        with gzip.open(traces[-1], "rt") as fh:
            data = json.load(fh)
        dev_pids = {
            p["pid"] for p in data.get("traceEvents", [])
            if p.get("ph") == "M" and p.get("name") == "process_name"
            and "TPU" in str(p.get("args", {}).get("name", ""))
            and "host" not in str(p.get("args", {}).get("name", "")).lower()
        }
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
                agg[ev.get("name", "?")] += ev.get("dur", 0.0)
                total += ev.get("dur", 0.0)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    steps = 3 * K
    rec = {
        "task": task, "batch": B, "imgsz": imgsz, "K": K,
        "total_device_ms_per_step": round(total / 1e3 / steps, 2),
        "top_ops": [
            {"op": k, "us_per_step": round(v / steps, 1),
             "pct": round(v / max(total, 1) * 100, 1)}
            for k, v in top
        ],
    }
    out = ROOT / "runs" / f"profile_step_{task}_b{B}.json"
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec)[:1200])


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else "detect", int(args[1]) if len(args) > 1 else 16)
