"""Val-speed cost of the full-resolution raster default (VERDICT r4 next-#5):
times YOLO.val on the committed seg160 floor checkpoint at val_mask_ratio 1
(new default, reference-protocol full-imgsz grid) vs 4 (the old shortcut),
on the real chip. Writes runs/val_maskratio_r5.json.
"""
import json
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main(n_val=64, batch=16):
    from helpers import make_shape_dataset

    from yolo_contour_regression_tpu.engine.model import YOLO

    rec_dir = ROOT / "runs" / "floor_seg160"
    cfg = json.loads((rec_dir / "floor.json").read_text())["config"]
    tmp = Path(tempfile.mkdtemp())
    yaml_path = make_shape_dataset(
        tmp / "ds", n_train=2, n_val=n_val, imgsz=cfg["imgsz"], seed=cfg["seed"]
    )
    m = YOLO(str(rec_dir / "best.ckpt"))
    rows = []
    for ratio in (1, 4):
        # fresh validator per ratio so the jitted eval program re-lowers
        t0 = time.perf_counter()
        res = m.val(data=str(yaml_path), imgsz=cfg["imgsz"], batch=batch,
                    val_mask_ratio=ratio, project=str(tmp / f"r{ratio}"))
        compile_and_run = time.perf_counter() - t0
        t1 = time.perf_counter()
        res = m.val(data=str(yaml_path), imgsz=cfg["imgsz"], batch=batch,
                    val_mask_ratio=ratio, project=str(tmp / f"r{ratio}b"))
        warm = time.perf_counter() - t1
        rows.append({
            "val_mask_ratio": ratio,
            "mask_map50_95": round(float(res["metrics/mAP50-95(M)"]), 4),
            "box_map50_95": round(float(res["metrics/mAP50-95(B)"]), 4),
            "warm_s_total": round(warm, 2),
            "warm_ms_per_img": round(warm / n_val * 1e3, 1),
            "first_s_total_incl_compile": round(compile_and_run, 2),
        })
    rec = {"n_val": n_val, "batch": batch, "imgsz": cfg["imgsz"], "rows": rows}
    (ROOT / "runs" / "val_maskratio_r5.json").write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:3]]
    main(*a)
