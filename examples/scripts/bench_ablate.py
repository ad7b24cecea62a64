"""Pipeline component ablation (VERDICT r2 next-#7): where do the e2e
0.39-MFU vs model-only 0.45-MFU gap and the batch-256 regression come from?

Measures, at each batch size, the in-graph iterated time of nested pipeline
prefixes on the real chip:
  model        : backbone/PAN/head only (raw maps)
  +decode      : + in-graph polar decode (distance2mask)
  +pre         : + uint8 -> bf16 normalize on device
  +nms         : + fixed-shape NMS (the full bench.py pipeline)
Writes runs/bench_ablate.json.
"""
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import numpy as np


def measure(batch: int) -> dict:
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.fuse import fuse_variables
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.ops.nms import non_max_suppression

    imgsz, dtype = 640, jnp.bfloat16
    model = build_model(
        str(ROOT / "yolo_contour_regression_tpu/cfg/models/yolov8-seg.yaml"),
        nc=10, dtype=dtype,
    )
    variables = model.init(imgsz=imgsz)
    variables, model = fuse_variables(model, variables)

    rng = np.random.default_rng(0)
    # raw/x0 MUST be jit arguments, never closed over: a closed-over batch
    # tensor is baked into the HLO as a constant, and at 640px batches the
    # tunneled remote-compile request rejects the body (HTTP 413)
    raw = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
    x0 = raw.astype(dtype) / 255.0

    def stage_model(variables, raw, x0, acc):
        outs = model.raw_forward(variables, x0 + (acc * 1e-12).astype(dtype), train=False)
        return sum(o.astype(jnp.float32).sum() for o in outs)

    def stage_decode(variables, raw, x0, acc):
        pred = model.predict(variables, x0 + (acc * 1e-12).astype(dtype))
        return pred.astype(jnp.float32).sum()

    def stage_pre(variables, raw, x0, acc):
        x = raw.astype(dtype) / 255.0 + (acc * 1e-12).astype(dtype)
        pred = model.predict(variables, x)
        return pred.astype(jnp.float32).sum()

    def stage_full(variables, raw, x0, acc):
        x = raw.astype(dtype) / 255.0 + (acc * 1e-12).astype(dtype)
        pred = model.predict(variables, x)
        out = non_max_suppression(
            pred.astype(jnp.float32), nc=model.nc, conf_thres=0.25,
            iou_thres=0.7, pre_nms=300, max_det=300,
        )
        return out["scores"].sum()

    def stage_full_lazy(variables, raw, x0, acc):
        # the shipped bench.py pipeline after the lazy-decode change:
        # boxes/scores + [rays|anchor] pre-NMS, contour points reconstructed
        # for the max_det survivors only (head.py decode_polar_lazy)
        from yolo_contour_regression_tpu.nn.modules.head import (
            finalize_polar_extras,
        )

        x = raw.astype(dtype) / 255.0 + (acc * 1e-12).astype(dtype)
        pred = model.predict_lazy(variables, x)
        out = non_max_suppression(
            pred.astype(jnp.float32), nc=model.nc, conf_thres=0.25,
            iou_thres=0.7, pre_nms=300, max_det=300,
        )
        ex = finalize_polar_extras(out["extras"])
        return out["scores"].sum() + ex.sum() * 1e-12

    def stage_full_parts(variables, raw, x0, acc):
        # the r4 hot path (bench.py default): unconcatenated (B, A, .)
        # decode straight into parts-NMS — no (B, C, A) transpose round-trip,
        # no full-tensor f32 cast, no pre-NMS contour materialization
        from yolo_contour_regression_tpu.nn.modules.head import (
            finalize_polar_extras,
        )
        from yolo_contour_regression_tpu.ops.nms import non_max_suppression_parts

        x = raw.astype(dtype) / 255.0 + (acc * 1e-12).astype(dtype)
        boxes, logits, extras = model.predict_parts(variables, x, sigmoid=False)
        out = non_max_suppression_parts(
            boxes, logits, extras, conf_thres=0.25, iou_thres=0.7,
            pre_nms=300, max_det=300, scores_are_logits=True,
        )
        ex = finalize_polar_extras(out["extras"])
        return out["scores"].sum() + ex.sum() * 1e-12

    def stage_full_topk(variables, raw, x0, acc):
        # filter-before-decode: candidates picked on raw class logits, boxes
        # and extras decoded for the pre_nms winners only — no full-anchor
        # boxes/extras tensors (head.decode_polar_topk; bit-identical to the
        # parts path per test_nms.py::test_topk_path_matches_parts_pipeline)
        from yolo_contour_regression_tpu.nn.modules.head import (
            finalize_polar_extras,
        )
        from yolo_contour_regression_tpu.ops.nms import (
            non_max_suppression_selected,
        )

        x = raw.astype(dtype) / 255.0 + (acc * 1e-12).astype(dtype)
        boxes, scores, classes, extras = model.predict_topk(
            variables, x, k=300, conf_thres=0.25
        )
        out = non_max_suppression_selected(
            boxes, scores, classes, extras, conf_thres=0.25, iou_thres=0.7,
            max_det=300,
        )
        ex = finalize_polar_extras(out["extras"])
        return out["scores"].sum() + ex.sum() * 1e-12

    stages = {"model": stage_model, "+decode": stage_decode,
              "+pre": stage_pre, "+nms": stage_full,
              "+nms(lazy)": stage_full_lazy,
              "+nms(parts)": stage_full_parts,
              "+nms(topk)": stage_full_topk}
    row = {"batch": batch}
    for name, fn in stages.items():
        @partial(jax.jit, static_argnames=("n",))
        def loop(variables, raw, x0, n, fn=fn):
            def body(i, acc):
                return fn(variables, raw, x0, acc)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        def timed(n):
            float(loop(variables, raw, x0, n))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(variables, raw, x0, n))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        per = (timed(24) - timed(4)) / 20
        row[name] = {"ms": round(per * 1e3, 2),
                     "imgs_per_sec": round(batch / per, 0)}
    return row


def main():
    batches = [int(b) for b in (sys.argv[1:] or ["64", "128", "256"])]
    rows = [measure(b) for b in batches]
    rec = {"rows": rows, "note": "in-graph fori_loop, long-minus-short timing; "
           "stages are nested prefixes of the bench.py pipeline"}
    (ROOT / "runs" / "bench_ablate.json").write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
