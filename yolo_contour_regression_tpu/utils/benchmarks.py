"""Benchmark harness (reference utils/benchmarks.py:47 ``benchmark()`` —
export + validate + time across formats; :150 ProfileModels latency harness).

Timing note: on tunneled-TPU images ``block_until_ready`` may not synchronize;
all timings here force a host readback of a scalar, and pipeline throughput is
measured with in-graph iteration (see bench.py methodology).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional

import numpy as np


def benchmark(
    model,
    imgsz: int = 640,
    batch: int = 16,
    formats: Optional[List[str]] = None,
    verbose: bool = True,
) -> List[Dict]:
    """Throughput/latency of the eval pipeline for the native + fused paths."""
    import jax
    import jax.numpy as jnp

    from ..nn.fuse import fuse_variables
    from ..ops.nms import non_max_suppression
    from . import LOGGER

    model._ensure_variables(imgsz)
    rows = []
    raw = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)
    )

    variants = [("jax-eager-graph", model.model, model.variables)]
    fused_v, fused_m = fuse_variables(model.model, model.variables)
    variants.append(("jax-fused", fused_m, fused_v))

    for name, m, v in variants:
        nc = m.nc

        @partial(jax.jit, static_argnames=("n",))
        def loop(variables, raw, n, m=m, nc=nc):
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
        rows.append(
            {
                "format": name,
                "imgsz": imgsz,
                "batch": batch,
                "latency_ms_per_batch": round(per_iter * 1e3, 3),
                "imgs_per_sec": round(batch / per_iter, 1),
            }
        )
        if verbose:
            LOGGER.info(f"benchmark {name}: {rows[-1]}")
    return rows
