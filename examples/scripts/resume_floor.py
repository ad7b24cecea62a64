"""Resume an interrupted floor run from its last.ckpt and finish the
train_floor.py protocol (final best-ckpt eval, floor.json at 75% of achieved,
flattened artifacts). Companion to train_floor.py — used when a long CPU floor
run is killed by a session boundary (reference parity: trainer resume
semantics, /root/reference/ultralytics-main/ultralytics/engine/trainer.py:590).

Usage: python examples/scripts/resume_floor.py [task] [epochs]
"""
import json
import shutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

from examples.scripts.train_floor import TASKS  # noqa: E402
from yolo_contour_regression_tpu.engine.model import YOLO  # noqa: E402


def main(task="rtdetr", epochs=300):
    model_yaml, _, floor_keys = TASKS[task]
    suffix = "" if task == "segment" else f"_{task}"
    out = ROOT / "runs" / f"floor{suffix}"
    last = out / "train" / "weights" / "last.ckpt"
    assert last.exists(), f"no resume point at {last}"
    m = YOLO(model_yaml, task=task)
    # resume=path restores train_args (data/imgsz/batch/optimizer/...) from
    # the checkpoint; only epochs may be overridden here
    metrics = m.train(resume=str(last), epochs=epochs, task=task)
    data = str(out / "dataset")
    # read imgsz back from the checkpoint's restored train args
    from yolo_contour_regression_tpu.utils.checkpoint import load_checkpoint
    ck = load_checkpoint(out / "train" / "weights" / "best.ckpt")
    imgsz = int(ck["train_args"].get("imgsz", 96))
    final = m.val(data=data, task=task, imgsz=imgsz, batch=8, project=str(out))
    record = {
        "train_metrics": {k: float(v) for k, v in metrics.items()},
        "final_val": {k: float(v) for k, v in final.items()},
        "floor": {name: round(float(final[k]) * 0.75, 3) for k, name in floor_keys.items()},
        "floor_keys": {k: name for k, name in floor_keys.items()},
        "config": {
            "task": task, "epochs": epochs, "imgsz": imgsz,
            "model": model_yaml, "seed": 0, "resumed": True,
        },
    }
    with open(out / "floor.json", "w") as fh:
        json.dump(record, fh, indent=2)
    train_dir = out / "train"
    if (train_dir / "weights" / "best.ckpt").exists():
        shutil.copy2(train_dir / "weights" / "best.ckpt", out / "best.ckpt")
    if (train_dir / "results.csv").exists():
        shutil.copy2(train_dir / "results.csv", out / "results.csv")
    print(json.dumps({task: record["final_val"]}))


if __name__ == "__main__":
    task = sys.argv[1] if len(sys.argv) > 1 else "rtdetr"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    main(task, epochs)
