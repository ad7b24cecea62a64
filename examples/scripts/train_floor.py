"""Train yolov8n-seg on the deterministic synthetic-shapes dataset and record
the mask-mAP evidence the repo commits to (VERDICT round-1 item #2).

Reference bar: the upstream CI benchmark job asserts per-task mAP floors
(.github/workflows/ci.yaml:126-137). This script produces the equivalent
artifact for the polar-TPU rebuild: runs/floor/ holds the curve (results.csv
+ results.png), the stripped best checkpoint, and floor.json with the final
metrics; tests/test_map_floor.py re-validates the committed checkpoint and
asserts the floor.

Usage (defaults sized for the one tunneled v5e chip + 1-CPU host):
    python examples/scripts/train_floor.py [epochs] [imgsz] [n_train]
"""
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

from tests.helpers import make_shape_dataset  # noqa: E402
from yolo_contour_regression_tpu.engine.model import YOLO  # noqa: E402


def main(epochs=150, imgsz=96, n_train=64, n_val=16, out=None):
    out = Path(out or ROOT / "runs" / "floor")
    ds_root = out / "dataset"
    yaml_path = make_shape_dataset(
        ds_root, n_train=n_train, n_val=n_val, imgsz=imgsz, seed=0
    )
    m = YOLO("yolov8n-seg.yaml")
    metrics = m.train(
        data=str(yaml_path),
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
        close_mosaic=max(epochs // 4, 5),
        patience=max(epochs, 50),
        plots=True,
    )
    final = m.val(data=str(yaml_path), imgsz=imgsz, batch=8, project=str(out))
    record = {
        "train_metrics": {k: float(v) for k, v in metrics.items()},
        "final_val": {k: float(v) for k, v in final.items()},
        "config": {
            "epochs": epochs, "imgsz": imgsz, "n_train": n_train,
            "n_val": n_val, "model": "yolov8n-seg.yaml", "seed": 0,
        },
    }
    with open(out / "floor.json", "w") as fh:
        json.dump(record, fh, indent=2)
    print(json.dumps(record["final_val"]))
    return record


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
