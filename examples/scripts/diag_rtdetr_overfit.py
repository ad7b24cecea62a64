#!/usr/bin/env python
"""RT-DETR overfit diagnostic (VERDICT r4 next-#3): train on 8 images and
evaluate on the SAME 8. A healthy DETR training path memorizes 8 clean
synthetic singles (box mAP50-95 >= 0.8); a low plateau here means the
matching/CDN/loss path is broken rather than data-starved.

Writes runs/diag_rtdetr_overfit.json.

Usage: python examples/scripts/diag_rtdetr_overfit.py [epochs] [imgsz] [lr0] [tag] [--noaug]

``tag`` names the run dir and artifact (runs/diag_rtdetr_overfit_<tag>.json)
so experiment ladders don't clobber each other; ``--noaug`` zeroes every
geometric/photometric augmentation for a pure memorization test.
"""
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

NOAUG = dict(hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, translate=0.0, scale=0.0,
             fliplr=0.0, flipud=0.0, degrees=0.0)


def main(epochs=300, imgsz=96, lr0=2e-4, out=None, tag="", noaug=False):
    from helpers import make_shape_dataset

    from yolo_contour_regression_tpu.engine.model import YOLO

    suffix = f"_{tag}" if tag else ""
    out = Path(out or ROOT / "runs" / f"diag_rtdetr_overfit{suffix}")
    ds_root = out / "dataset"
    yaml_path = make_shape_dataset(ds_root, n_train=8, n_val=8, imgsz=imgsz, seed=0)
    # overfit protocol: validate on the training images themselves
    yaml_path.write_text(
        f"path: {ds_root}\ntrain: images/train\nval: images/train\n"
        f"names:\n  0: circle\n  1: rect\n"
    )

    m = YOLO("yolov8n-rtdetr.yaml", task="rtdetr")
    metrics = m.train(
        data=str(yaml_path), task="rtdetr", epochs=epochs, imgsz=imgsz,
        batch=8, nbs=8, workers=2, cache="ram",
        optimizer="AdamW", lr0=lr0, warmup_epochs=2.0,
        mosaic=0.0, close_mosaic=0, mixup=0.0,
        project=str(out), name="train", exist_ok=True,
        patience=max(epochs, 50), plots=False, save_last_every=100,
        **(NOAUG if noaug else {}),
    )
    final = m.val(data=str(yaml_path), task="rtdetr", imgsz=imgsz, batch=8,
                  project=str(out))
    record = {
        "protocol": "train and eval on the same 8 synthetic images",
        "train_metrics": {k: float(v) for k, v in metrics.items()},
        "overfit_val": {k: float(v) for k, v in final.items()},
        "config": {"epochs": epochs, "imgsz": imgsz, "lr0": lr0, "n": 8,
                   "model": "yolov8n-rtdetr.yaml", "seed": 0, "noaug": noaug},
    }
    (ROOT / "runs" / f"diag_rtdetr_overfit{suffix}.json").write_text(
        json.dumps(record, indent=2)
    )
    print(json.dumps(record["overfit_val"]))
    return record


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if x != "--noaug"]
    main(epochs=int(a[0]) if a else 300,
         imgsz=int(a[1]) if len(a) > 1 else 96,
         lr0=float(a[2]) if len(a) > 2 else 2e-4,
         tag=a[3] if len(a) > 3 else "",
         noaug="--noaug" in sys.argv[1:])
