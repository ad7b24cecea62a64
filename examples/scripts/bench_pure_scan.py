"""Pure-step denominator measured with the SAME program shape as the e2e
pipeline: make_multi_train_step(augment_fn=None, from_pool=False) — a
lax.scan of K fused steps over pre-normalized f32 batches — timed with the
same steady-state host loop as bench_e2e_train. Two reasons over
bench_train.py's fori_loop probe:

* the b64 fori_loop program exceeds the deployment tunnel's remote-compile
  upload limit (HTTP 413, runs/train_bench_bucket16.json), while the scan
  form compiles fine (it is what e2e itself runs);
* identical program structure removes loop-invariant-code-motion asymmetry
  (a fori_loop over FIXED labels lets XLA hoist label-only work like GT ray
  construction; scanning over per-step label slices cannot — and e2e labels
  genuinely change per step).

Writes runs/train_bench_scan.json.
"""
import json
import math
import sys
import time
from pathlib import Path
from types import SimpleNamespace

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import numpy as np


def measure(B: int, nmax: int = 16, n_real: int = 8, imgsz: int = 640,
            K: int = 8, steps: int = 40, task: str = "segment") -> dict:
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
    tx = build_optimizer(variables["params"], hyp, steps_per_epoch=K,
                         iterations=K * steps)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 1, (K, B, imgsz, imgsz, 3)).astype(np.float32))
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    # crowded small-object geometry, like bench_train.py --crowded
    side = int(math.ceil(math.sqrt(n_real)))
    cxs = (np.arange(nmax) % side + 0.5) / side
    cys = (np.arange(nmax) // side + 0.5) / side % 1.0
    r = 0.3 / side
    segs = np.stack([
        np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], -1)
        for cx, cy in zip(cxs, cys)
    ]).astype(np.float32)  # (nmax, 360, 2)
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
    multi_fn = make_multi_train_step(model, tx, hyp, cand=128, donate=True,
                                     augment_fn=None, from_pool=False)
    state = init_train_state(variables, tx)

    def run(n):
        nonlocal state
        metrics = None
        done = 0
        while done < n:
            state, metrics = multi_fn(state, images, labels)
            done += K
        return metrics, done

    m, _ = run(2 * K)  # compile + warm
    float(np.asarray(m["loss"])[-1])
    t0 = time.perf_counter()
    m, n_done = run(steps)
    float(np.asarray(m["loss"])[-1])  # sync
    dt = time.perf_counter() - t0
    return {
        "task": task,
        "batch": B, "nmax": nmax, "n_real": n_real, "imgsz": imgsz, "K": K,
        "ms_per_step": round(dt / n_done * 1e3, 1),
        "imgs_per_sec": round(n_done * B / dt, 1),
        "steps": n_done,
    }


def main():
    rows = []
    rec = {"rows": rows,
           "note": "pure fused step as the SAME K-step lax.scan program the "
                   "e2e pipeline runs (augment disabled, images "
                   "pre-normalized) — the honest e2e-efficiency denominator"}
    out = ROOT / "runs" / "train_bench_scan.json"
    for kw in (dict(B=16, n_real=8), dict(B=16, n_real=16),
               dict(B=64, n_real=8),
               # detect at the same shapes: the scan-form (unhoistable)
               # polar-vs-detect training-cost ratio — the fori probe in
               # bench_train.py hoists both tasks' label-only work, which
               # flatters polar more (its GT-ray construction is the big
               # label-side cost)
               dict(B=16, n_real=8, task="detect"),
               dict(B=64, n_real=8, task="detect")):
        try:
            rows.append(measure(**kw))
        except Exception as e:
            rows.append({"error": repr(e)[:200], **kw})
        out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
