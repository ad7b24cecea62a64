"""Per-op attribution for the deploy pipeline: jax.profiler trace of the
fused parts pipeline (model -> decode -> NMS -> finalize) at batch 128,
aggregated by op name from the trace-viewer events.

The staged ablation (bench_ablate.py) says decode+NMS add ~4.3 ms to the
10.2 ms model at batch 128 but cannot say WHERE (stage boundaries force
materializations the fused program doesn't have). This answers it: top-K
ops by self time, written to runs/profile_pipeline.json.

Usage: python examples/scripts/profile_pipeline.py [batch] [iters]
"""
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import numpy as np


def main(batch=128, iters=20):
    import yolo_contour_regression_tpu  # noqa: F401  (honors JAX_PLATFORMS)
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.fuse import fuse_variables
    from yolo_contour_regression_tpu.nn.modules.head import finalize_polar_extras
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.ops.nms import non_max_suppression_parts

    dtype = jnp.bfloat16
    model = build_model(
        str(ROOT / "yolo_contour_regression_tpu/cfg/models/yolov8-seg.yaml"),
        nc=80, dtype=dtype,
    )
    variables = model.init(imgsz=640)
    variables, model = fuse_variables(model, variables)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8))

    @jax.jit
    def step(variables, raw_u8, acc):
        x = raw_u8.astype(dtype) / 255.0 + (acc * 1e-12).astype(dtype)
        boxes, logits, extras = model.predict_parts(variables, x, sigmoid=False)
        out = non_max_suppression_parts(
            boxes, logits, extras, scores_are_logits=True,
            conf_thres=0.25, iou_thres=0.7, pre_nms=300, max_det=300,
        )
        ex = finalize_polar_extras(out["extras"])
        return out["scores"].sum() + ex.sum() * 1e-12

    acc = jnp.zeros((), jnp.float32)
    acc = step(variables, raw, acc)  # compile
    jax.block_until_ready(acc)

    tdir = ROOT / "runs" / "profile_trace"
    with jax.profiler.trace(str(tdir)):
        for _ in range(iters):
            acc = step(variables, raw, acc)
        jax.block_until_ready(acc)

    # aggregate trace-viewer events by op name (device lanes only)
    traces = sorted(glob.glob(str(tdir / "**" / "*.trace.json.gz"), recursive=True))
    agg = defaultdict(float)
    total = 0.0
    if traces:
        with gzip.open(traces[-1], "rt") as fh:
            data = json.load(fh)
        # device-lane pids: names containing TPU/device; fall back to all
        pid_names = {
            e["pid"]: e["args"].get("name", "")
            for e in data.get("traceEvents", [])
            if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
        }
        dev_pids = {p for p, n in pid_names.items()
                    if any(s in n.lower() for s in ("tpu", "device", "/device"))}
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X" or "dur" not in e:
                continue
            if dev_pids and e.get("pid") not in dev_pids:
                continue
            agg[e["name"]] += e["dur"]
            total += e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    rec = {
        "batch": batch, "iters": iters,
        # when no lane name matches tpu/device the aggregation fell back to
        # every lane (host Python included) — percentages are then only a
        # rough signal, flag it
        "host_fallback": not dev_pids,
        "device_lanes": len(dev_pids),
        "total_device_us": round(total, 1),
        # NOTE: sums across matching lanes; with multiple device streams
        # this exceeds wall time — use pct for attribution, not per_iter_ms
        "per_iter_ms": round(total / max(iters, 1) / 1e3, 3),
        "top_ops_us": [
            {"op": k, "us": round(v, 1), "pct": round(100 * v / total, 1) if total else 0}
            for k, v in top
        ],
        "trace_files": len(traces),
    }
    (ROOT / "runs" / "profile_pipeline.json").write_text(json.dumps(rec, indent=1))
    print(json.dumps({"per_iter_ms": rec["per_iter_ms"],
                      "top5": rec["top_ops_us"][:5]}))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
