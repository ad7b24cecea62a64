"""End-to-end TRAINING throughput with real data (VERDICT r2 next-#1 "done"
criterion): steady-state imgs/s of the full loop — host loader (decode +
letterbox from cache) -> H2D uint8 -> device-side augmentation -> fused
train step — at 640px on one chip.

Run AFTER the loader/augmentation changes to show training is
compute-bound, not loader-bound. Writes runs/e2e_train_bench.json.
"""
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import numpy as np


def main(imgsz=640, batch=16, steps=40, n_imgs=128):
    # dev_labels=True is the production trainer path (labels HBM-resident
    # like the image pool, per-dispatch host traffic = indices only);
    # dev_labels=False ships stacked (K, B, ...) f32 label arrays per
    # dispatch — the A/B isolates the tunnel's label-H2D cost
    rows = [run_one(imgsz, batch, steps, n_imgs, "device", 8, dev_labels=True),
            run_one(imgsz, batch, steps, n_imgs, "device", 8),
            run_one(imgsz, batch, steps, n_imgs, "device", 1),
            run_one(imgsz, batch, steps, n_imgs, "ram", 1)]
    # prebatch_augment A/B: one vectorized K*B augment before the scan
    # instead of K in-scan augments (engine/step.py make_multi_train_step)
    rows.append(run_one(imgsz, batch, steps, n_imgs, "device", 8, prebatch=True))
    # realistic large-batch training point: the fused step amortizes decode/
    # assigner fixed costs over 4x the images (bench_train.py measures the
    # pure step only at 16)
    rows.append(run_one(imgsz, 64, steps, n_imgs, "device", 8, dev_labels=True))
    rows.append(run_one(imgsz, 64, steps, n_imgs, "device", 8))
    rec = {"rows": rows,
           "note": "cache='device' + steps_per_dispatch=8: lax.scan of 8 "
                   "optimizer steps per device call over the HBM image pool "
                   "(engine/step.py make_multi_train_step) — amortizes the "
                   "~650ms tunnel dispatch round-trip; spd=1: one dispatch "
                   "per step; cache='ram': host decode cache + per-step H2D"}
    import os

    out = Path(os.environ.get("E2E_OUT", ROOT / "runs" / "e2e_train_bench.json"))
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))


def run_one(imgsz=640, batch=16, steps=40, n_imgs=128, cache="ram", spd=1,
            prebatch=False, dev_labels=False):
    from tests.helpers import make_shape_dataset
    from yolo_contour_regression_tpu.cfg import get_cfg
    from yolo_contour_regression_tpu.data.build import build_dataloader, build_yolo_dataset
    from yolo_contour_regression_tpu.data.device_augment import make_augment_fn
    from yolo_contour_regression_tpu.data.utils import check_det_dataset
    from yolo_contour_regression_tpu.engine.step import (
        init_train_state,
        make_multi_train_step,
        make_train_step,
    )
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.optim import build_optimizer
    import jax
    import jax.numpy as jnp

    ds_dir = ROOT / "runs" / "e2e_train_ds"
    yaml_path = make_shape_dataset(ds_dir, n_train=n_imgs, n_val=4, imgsz=1280, seed=0)
    data = check_det_dataset(str(yaml_path))
    cfg = get_cfg(dict(task="segment", imgsz=imgsz, batch=batch, cache=cache,
                       device_augment=True, max_instances=16, nbs=batch))
    train_set = build_yolo_dataset(cfg, data["train"], batch, data, mode="train")
    loader = build_dataloader(train_set, batch, workers=2, shuffle=True, mode="train")

    model = build_model(
        str(ROOT / "yolo_contour_regression_tpu/cfg/models/yolov8-seg.yaml"),
        nc=2, dtype=jnp.bfloat16,
    )
    variables = model.init(imgsz=imgsz)
    cfg.epochs, cfg.nc = 10, 2
    tx = build_optimizer(variables["params"], cfg, steps_per_epoch=10, iterations=10 * steps)
    state = init_train_state(variables, tx)
    aug_fn = make_augment_fn(cfg, imgsz, cfg.max_instances, mesh=None)

    if spd > 1:
        # multi-step-per-dispatch (trainer 'steps_per_dispatch' path)
        multi_fn = make_multi_train_step(model, tx, cfg, cand=128,
                                         augment_fn=aug_fn, donate=True,
                                         prebatch_augment=prebatch,
                                         labels_from_pool=dev_labels)
        sup = loader.superbatches(spd, idx_only=dev_labels)

        def run(n):
            nonlocal state
            metrics = None
            done = 0
            while done < n:
                idxs, labels = next(sup)
                if dev_labels:
                    labels = loader.label_pool()
                state, metrics = multi_fn(state, loader.images, idxs, labels)
                done += idxs.shape[0]
            return {k: v[-1] for k, v in metrics.items()}, done
    else:
        step_fn = make_train_step(model, tx, cfg, cand=128, augment_fn=aug_fn,
                                  donate=True)
        it = iter(loader)

        def run(n):
            nonlocal state
            for _ in range(n):
                b = next(it)
                images = jnp.asarray(b.pop("img"))
                bd = {k: jnp.asarray(v) for k, v in b.items()}
                state, metrics = step_fn(state, images, bd)
            return metrics, n

    # warmup: fills the RAM cache + compiles each instance bucket
    m, _ = run(10)
    loss0 = float(m["loss"])
    t0 = time.perf_counter()
    m, n_done = run(steps)
    # force sync through a host readback of the final metrics
    loss1 = float(m["loss"])
    dt = time.perf_counter() - t0
    imgs_per_sec = n_done * batch / dt
    rec = {
        "cache": cache,
        "steps_per_dispatch": spd,
        "prebatch_augment": prebatch,
        "device_labels": dev_labels,
        "imgs_per_sec": round(imgs_per_sec, 1),
        "ms_per_step": round(dt / n_done * 1e3, 1),
        "batch": batch, "imgsz": imgsz, "steps": n_done,
        "loss_first": round(loss0, 3), "loss_last": round(loss1, 3),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:5]]
    main(*args)
