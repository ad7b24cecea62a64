"""Benchmark harness (reference utils/benchmarks.py:47 ``benchmark()`` —
export + validate + time across formats; :150 ProfileModels latency harness).

Timing note: on tunneled-TPU images ``block_until_ready`` may not synchronize;
all timings here force a host readback of a scalar, and pipeline throughput is
measured with in-graph iteration (see bench.py methodology).
"""
from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def _device_loop_throughput(m, v, raw, batch: int) -> Dict:
    """imgs/sec of preprocess+predict+NMS via in-graph iteration."""
    import jax
    import jax.numpy as jnp

    from ..ops.nms import non_max_suppression

    nc = m.nc

    @partial(jax.jit, static_argnames=("n",))
    def loop(variables, raw, n):
        def body(i, acc):
            x = raw.astype(jnp.float32) / 255.0 + acc * 1e-12
            pred = m.predict(variables, x)
            if m.task in ("segment", "detect", "pose"):
                out = non_max_suppression(
                    jnp.asarray(pred, jnp.float32), nc=nc, conf_thres=0.25,
                    iou_thres=0.7, pre_nms=1024, max_det=300,
                )
                return out["scores"].sum()
            return jnp.asarray(pred, jnp.float32).sum()

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(v, raw, 2))  # compile
    t = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(v, raw, 2))
        t1 = time.perf_counter()
        float(loop(v, raw, 10))
        t.append((time.perf_counter() - t1) - (t1 - t0))
    per_iter = min(t) / 8
    return {
        "latency_ms_per_batch": round(per_iter * 1e3, 3),
        "imgs_per_sec": round(raw.shape[0] / per_iter, 1),
    }


class _BackendModel:
    """Adapts an AutoBackend artifact to the validator's model protocol."""

    def __init__(self, backend, template):
        self._backend = backend
        self.task = template.task
        self.nc = template.nc
        self.names = getattr(template, "names", {})
        self.strides = template.strides

    def predict(self, variables, x):  # variables unused: weights are baked in
        import jax.numpy as jnp

        return jnp.asarray(self._backend(x))


def _val_metric(model_like, variables, data, task: str, imgsz: int) -> Optional[float]:
    from ..engine.validator import (
        DetectionValidator,
        SegmentationValidator,
    )
    from ..cfg import get_cfg

    cls = SegmentationValidator if task == "segment" else DetectionValidator
    v = cls(args=get_cfg(overrides={"imgsz": imgsz, "batch": 4, "task": task}))
    res = v(model=model_like, variables=variables, data=data)
    key = "metrics/mAP50-95(M)" if task == "segment" else "metrics/mAP50-95(B)"
    return float(res.get(key, res.get("metrics/mAP50-95(B)", 0.0)))


def benchmark(
    model,
    data: Optional[str] = None,
    imgsz: int = 640,
    batch: int = 16,
    formats: Optional[List[str]] = None,
    project: Optional[str] = None,
    verbose: bool = True,
) -> List[Dict]:
    """Export + reload + time (and, where the artifact is jax-callable,
    validate) every format — the reference ``benchmark()`` table
    (benchmarks.py:47): one row per format with status, latency and metric.

    TF-runtime artifacts (saved_model/tflite) cannot run inside the jitted
    val program, so their row carries a prediction-consistency check against
    the native path (max|Δ|) instead of mAP — a stricter artifact test than
    re-measuring the same weights' mAP."""
    import jax.numpy as jnp

    from ..nn.autobackend import AutoBackend
    from ..nn.fuse import fuse_variables
    from . import LOGGER

    model._ensure_variables(imgsz)
    formats = formats or [
        "native", "fused", "int8", "stablehlo", "onnx", "saved_model", "tflite", "pb",
    ]
    out_dir = Path(project or "runs/benchmark")
    rows: List[Dict] = []
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
    x1 = rng.uniform(0, 1, (1, imgsz, imgsz, 3)).astype(np.float32)

    fused_v, fused_m = fuse_variables(model.model, model.variables)
    native_pred = np.asarray(fused_m.predict(fused_v, jnp.asarray(x1)))

    for fmt in formats:
        row: Dict = {"format": fmt, "imgsz": imgsz, "batch": batch, "status": "ok"}
        try:
            if fmt in ("native", "fused", "int8"):
                if fmt == "int8":
                    # native w8a8 (nn/quant.py): int8 convs on the MXU path,
                    # calibrated here on one uniform batch (throughput row;
                    # accuracy-grade calibration wants real images)
                    from ..nn.quant import quantize_variables

                    if getattr(fused_m, "quantized", False):
                        # handle was loaded from an int8 checkpoint — use as-is
                        v, m = fused_v, fused_m
                    else:
                        v, m = quantize_variables(
                            fused_m, fused_v,
                            [rng.uniform(0, 1, (2, imgsz, imgsz, 3)).astype(np.float32)],
                        )
                else:
                    m, v = (model.model, model.variables) if fmt == "native" else (fused_m, fused_v)
                row.update(_device_loop_throughput(m, v, raw, batch))
                if data is not None:
                    row["mAP50-95"] = _val_metric(m, v, data, m.task, imgsz)
            else:
                path = model.export(format=fmt, imgsz=imgsz, project=str(out_dir))
                backend = AutoBackend(path)
                t0 = time.perf_counter()
                pred = np.asarray(backend(x1))
                row["cold_latency_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
                t0 = time.perf_counter()
                for _ in range(3):
                    pred = np.asarray(backend(x1))
                row["latency_ms_per_img"] = round((time.perf_counter() - t0) / 3 * 1e3, 2)
                row["consistency_maxabs"] = float(np.abs(pred - native_pred).max())
                if fmt == "stablehlo" and data is not None:
                    shim = _BackendModel(backend, model.model)
                    row["mAP50-95"] = _val_metric(shim, None, data, shim.task, imgsz)
        except Exception as e:  # a failing format must not kill the table
            row["status"] = f"fail: {type(e).__name__}: {e}"
        rows.append(row)
        if verbose:
            LOGGER.info(f"benchmark {fmt}: {row}")
    return rows


def profile_models(
    models: List[str],
    imgsz: int = 640,
    batch: int = 1,
    num_timed_runs: int = 10,
    verbose: bool = True,
) -> List[Dict]:
    """Per-model latency table (reference ProfileModels, benchmarks.py:150):
    build each yaml/ckpt, measure fused predict latency with sigma-clipped
    repeats, report params + latency mean/std."""
    import jax
    import jax.numpy as jnp

    from ..engine.model import YOLO
    from ..nn.fuse import fuse_variables
    from . import LOGGER

    rows = []
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    )
    for name in models:
        handle = YOLO(name)
        handle._ensure_variables(imgsz)
        v, m = fuse_variables(handle.model, handle.variables)
        fn = jax.jit(lambda xx, m=m, v=v: m.predict(v, xx))
        np.asarray(fn(x))  # compile
        ts = []
        for _ in range(num_timed_runs):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            ts.append((time.perf_counter() - t0) * 1e3)
        ts = np.asarray(ts)
        # sigma clip (reference iterative_sigma_clipping)
        for _ in range(3):
            keep = np.abs(ts - ts.mean()) <= 2 * ts.std() + 1e-9
            ts = ts[keep] if keep.any() else ts
        rows.append(
            {
                "model": str(name),
                "params_M": round(handle.model.num_params / 1e6, 2),
                "latency_ms": round(float(ts.mean()), 2),
                "latency_std_ms": round(float(ts.std()), 2),
                "imgsz": imgsz,
            }
        )
        if verbose:
            LOGGER.info(f"profile {name}: {rows[-1]}")
    return rows
