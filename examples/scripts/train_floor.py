"""Train per-task models on deterministic synthetic datasets and record the
quality floors the repo commits to (VERDICT round-1 item #2).

Reference bar: the upstream CI benchmark job asserts per-task mAP floors
(.github/workflows/ci.yaml:126-137: seg >= 0.30, det >= 0.26, cls >= 0.36,
pose >= 0.17 at imgsz=160). This script produces the equivalent artifacts for
the polar-TPU rebuild: runs/floor{,_detect,_pose,_classify}/ each hold the
training curve (results.csv), the stripped best checkpoint, and floor.json
with the final metrics plus a committed "floor" (75% of the achieved value);
tests/test_map_floor.py re-validates every committed checkpoint from scratch
and asserts its floor.

Usage (defaults sized for the one tunneled v5e chip + 1-CPU host):
    python examples/scripts/train_floor.py [task] [epochs] [imgsz] [n_train]
    task in {segment (default), detect, pose, classify, all}
"""
import json
import shutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

# JAX_PLATFORMS is honored by the package __init__ (mirrored into jax.config,
# since site hooks can pre-import jax and void the env var) — floor artifacts
# are quality evidence, identical on CPU and TPU backends

from tests.helpers import (  # noqa: E402
    make_cls_dataset,
    make_pose_dataset,
    make_shape_dataset,
)
from yolo_contour_regression_tpu.engine.model import YOLO  # noqa: E402

# per-task: (model yaml, dataset builder, primary metric keys -> floor names)
TASKS = {
    "segment": (
        "yolov8n-seg.yaml", make_shape_dataset,
        {"metrics/mAP50-95(M)": "mask_mAP50-95", "metrics/mAP50-95(B)": "box_mAP50-95"},
    ),
    "detect": (
        "yolov8n.yaml", make_shape_dataset,
        {"metrics/mAP50-95(B)": "box_mAP50-95"},
    ),
    "pose": (
        "yolov8n-pose.yaml", make_pose_dataset,
        {"metrics/mAP50-95(P)": "pose_mAP50-95", "metrics/mAP50-95(B)": "box_mAP50-95"},
    ),
    "classify": (
        "yolov8n-cls.yaml", make_cls_dataset,
        {"metrics/accuracy_top1": "accuracy_top1"},
    ),
    # v8-CSP backbone + RT-DETR decoder at scale n (reference
    # cfg/models/v8/yolov8-rtdetr.yaml): evidences the deformable-decoder +
    # Hungarian/CDN loss family trains end-to-end, not just that grads flow
    "rtdetr": (
        "yolov8n-rtdetr.yaml", make_shape_dataset,
        {"metrics/mAP50-95(B)": "box_mAP50-95"},
    ),
}


def main(task="segment", epochs=150, imgsz=96, n_train=64, n_val=16, out=None):
    model_yaml, make_ds, floor_keys = TASKS[task]
    suffix = "" if task == "segment" else f"_{task}"
    # resolve(): a relative --out would otherwise produce a relative dataset
    # yaml `path:`, which the loader joins onto the yaml's own directory —
    # duplicating the prefix (the r5b floor192 failure)
    out = Path(out or ROOT / "runs" / f"floor{suffix}").resolve()
    ds_root = out / "dataset"
    if task == "classify":
        make_cls_dataset(ds_root, n_train=n_train, n_val=n_val, imgsz=imgsz, seed=0)
        data = str(ds_root)
    elif task == "pose":
        data = str(make_pose_dataset(ds_root, n_train=n_train, n_val=n_val, imgsz=imgsz, seed=0))
    else:
        data = str(make_shape_dataset(ds_root, n_train=n_train, n_val=n_val, imgsz=imgsz, seed=0))

    m = YOLO(model_yaml, task=task)
    kw = dict(
        data=data,
        task=task,
        epochs=epochs,
        imgsz=imgsz,
        batch=16,
        nbs=16,  # no accumulation: keep 4 optimizer steps/epoch on 64 imgs
        workers=2,
        cache="ram",
        mixup=0.0,  # tiny dataset: mixup suppresses the tiny signal
        project=str(out),
        name="train",
        exist_ok=True,
        patience=max(epochs, 50),
        plots=task != "classify",
        # the tunneled chip's D2H link makes every-epoch last.ckpt readback
        # (~4x params) cost more than the epoch; thin the cadence (best
        # still saves on improvement, final epoch always saves)
        save_last_every=25,
    )
    if task == "rtdetr":
        # DETR-family standard recipe: AdamW at a transformer-scale lr; mosaic
        # off (the 300-query decoder overfits tiny synthetic sets fastest on
        # clean singles)
        kw.update(optimizer="AdamW", lr0=2e-4, warmup_epochs=2.0,
                  mosaic=0.0, close_mosaic=0)
    elif task != "classify":
        kw["close_mosaic"] = max(epochs // 4, 5)
    else:
        # the fork's classify loss is CE summed / 64 (loss.py:1107): at batch
        # 16 the gradient is 4x smaller than mean-CE, so short floor runs
        # need a hotter lr to move off the random-feature plateau
        kw["lr0"] = 0.1
        kw["warmup_epochs"] = 1.0
    metrics = m.train(**kw)
    final = m.val(data=data, task=task, imgsz=imgsz, batch=8, project=str(out))
    record = {
        "train_metrics": {k: float(v) for k, v in metrics.items()},
        "final_val": {k: float(v) for k, v in final.items()},
        # committed floor = 75% of achieved, the regression margin the floor
        # test asserts (tests/test_map_floor.py)
        "floor": {name: round(float(final[k]) * 0.75, 3) for k, name in floor_keys.items()},
        "floor_keys": {k: name for k, name in floor_keys.items()},
        "config": {
            "task": task, "epochs": epochs, "imgsz": imgsz, "n_train": n_train,
            "n_val": n_val, "model": model_yaml, "seed": 0,
        },
    }
    with open(out / "floor.json", "w") as fh:
        json.dump(record, fh, indent=2)
    # flatten the committed artifacts (ckpt + curve) to the floor dir
    train_dir = out / "train"
    best = train_dir / "weights" / "best.ckpt"
    if best.exists():
        shutil.copy2(best, out / "best.ckpt")
    if (train_dir / "results.csv").exists():
        shutil.copy2(train_dir / "results.csv", out / "results.csv")
    print(json.dumps({task: record["final_val"]}))
    return record


if __name__ == "__main__":
    task = sys.argv[1] if len(sys.argv) > 1 else "segment"
    extra = [int(a) for a in sys.argv[2:5]]
    if task == "all":
        for t, args in (
            ("detect", (100, 96, 64)),
            ("pose", (150, 96, 64)),
            ("classify", (60, 64, 48)),
        ):
            main(t, *args)
    else:
        main(task, *extra)
