#!/usr/bin/env python
"""RT-DETR overfit diagnostic (VERDICT r4 next-#3): train on 8 images and
evaluate on the SAME 8. A healthy DETR training path memorizes 8 clean
synthetic singles (box mAP50-95 >= 0.8); a low plateau here means the
matching/CDN/loss path is broken rather than data-starved.

Writes runs/diag_rtdetr_overfit.json.

Usage: python examples/scripts/diag_rtdetr_overfit.py [epochs] [imgsz] [lr0]
"""
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main(epochs=300, imgsz=96, lr0=2e-4, out=None):
    from helpers import make_shape_dataset

    from yolo_contour_regression_tpu.engine.model import YOLO

    out = Path(out or ROOT / "runs" / "diag_rtdetr_overfit")
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
    )
    final = m.val(data=str(yaml_path), task="rtdetr", imgsz=imgsz, batch=8,
                  project=str(out))
    record = {
        "protocol": "train and eval on the same 8 synthetic images",
        "train_metrics": {k: float(v) for k, v in metrics.items()},
        "overfit_val": {k: float(v) for k, v in final.items()},
        "config": {"epochs": epochs, "imgsz": imgsz, "lr0": lr0, "n": 8,
                   "model": "yolov8n-rtdetr.yaml", "seed": 0},
    }
    (ROOT / "runs" / "diag_rtdetr_overfit.json").write_text(
        json.dumps(record, indent=2)
    )
    print(json.dumps(record["overfit_val"]))
    return record


if __name__ == "__main__":
    a = sys.argv[1:]
    main(epochs=int(a[0]) if a else 300,
         imgsz=int(a[1]) if len(a) > 1 else 96,
         lr0=float(a[2]) if len(a) > 2 else 2e-4)
