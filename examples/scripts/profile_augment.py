"""Per-op attribution for the device augmentation stage (VERDICT r4 next-#2):
jax.profiler trace of make_augment_fn alone at train shapes, aggregated by op
name — says WHERE the ~122 ms/step residual (runs/e2e_diag_r4b.json
aug_only_ms_per_step) actually goes so it can be shrunk or overlapped.

Usage: python examples/scripts/profile_augment.py [batch] [imgsz] [iters]
Writes runs/profile_augment.json.
"""
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path
from types import SimpleNamespace

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import numpy as np


def main(batch=16, imgsz=640, iters=30):
    import yolo_contour_regression_tpu  # noqa: F401  (honors JAX_PLATFORMS)
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.data.device_augment import make_augment_fn

    hyp = SimpleNamespace(
        mosaic=1.0, mixup=1.0, degrees=0.0, translate=0.1, scale=0.5,
        shear=0.0, perspective=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
        fliplr=0.5, flipud=0.0,
    )
    n_max = 16
    aug = make_augment_fn(hyp, imgsz, max_instances=n_max)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), np.uint8))
    raw = {
        "cls": jnp.zeros((batch, n_max), jnp.int32),
        "bboxes": jnp.asarray(
            rng.uniform(0.3, 0.6, (batch, n_max, 4)).astype(np.float32)),
        "segments": jnp.asarray(
            rng.uniform(0.2, 0.8, (batch, n_max, 360, 2)).astype(np.float32)),
        "mask_gt": jnp.ones((batch, n_max), bool),
        "content_hw": jnp.full((batch, 2), float(imgsz)),
        "pad_tl": jnp.zeros((batch, 2)),
    }

    @jax.jit
    def step(key, images, raw):
        imgs, out = aug(key, images, raw)
        return (jnp.asarray(imgs, jnp.float32).sum()
                + sum(jnp.asarray(v, jnp.float32).sum() for v in out.values()))

    key = jax.random.PRNGKey(0)
    acc = step(key, images, raw)
    jax.block_until_ready(acc)

    import time

    t0 = time.perf_counter()
    for i in range(iters):
        acc = step(jax.random.fold_in(key, i), images, raw)
    jax.block_until_ready(acc)
    wall_ms = (time.perf_counter() - t0) / iters * 1e3

    tdir = ROOT / "runs" / "profile_augment_trace"
    with jax.profiler.trace(str(tdir)):
        for i in range(iters):
            acc = step(jax.random.fold_in(key, i), images, raw)
        jax.block_until_ready(acc)

    traces = sorted(glob.glob(str(tdir / "**" / "*.trace.json.gz"), recursive=True))
    agg = defaultdict(float)
    total = 0.0
    dev_pids = set()
    if traces:
        with gzip.open(traces[-1], "rt") as fh:
            data = json.load(fh)
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
        "batch": batch, "imgsz": imgsz, "iters": iters,
        "wall_ms_per_step": round(wall_ms, 2),
        "host_fallback": not dev_pids,
        "total_device_us": round(total, 1),
        "top_ops_us": [
            {"op": k, "us": round(v, 1), "pct": round(100 * v / total, 1) if total else 0}
            for k, v in top
        ],
    }
    (ROOT / "runs" / "profile_augment.json").write_text(json.dumps(rec, indent=1))
    print(json.dumps({"wall_ms_per_step": rec["wall_ms_per_step"],
                      "top8": rec["top_ops_us"][:8]}))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]))
