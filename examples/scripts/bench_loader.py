"""Input-pipeline throughput: loader imgs/sec with cache off / ram / disk
(VERDICT round-1 item #9 — on the 1-CPU host, JPEG decode is the bottleneck
long before the TPU; the decoded-image cache is what keeps training
device-bound). Records JSON to runs/loader_bench.json.
"""
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))


def bench(cache, yaml_path, imgsz=640, batches=8, batch=16, workers=2,
          device_augment=False):
    from yolo_contour_regression_tpu.cfg import get_cfg
    from yolo_contour_regression_tpu.data.build import build_dataloader, build_yolo_dataset
    from yolo_contour_regression_tpu.data.utils import check_det_dataset

    data = check_det_dataset(str(yaml_path))
    cfg = get_cfg({}, {"imgsz": imgsz, "task": "segment", "cache": cache,
                       "device_augment": device_augment})
    ds = build_yolo_dataset(cfg, data["train"], batch, data, mode="train")
    loader = build_dataloader(ds, batch, workers, shuffle=True, mode="train")
    it = iter(loader)
    # warm pass fills the cache
    for _ in range(batches):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(batches):
        b = next(it)
        n += b["img"].shape[0]
    dt = time.perf_counter() - t0
    return {"cache": str(cache), "device_augment": device_augment,
            "imgs_per_sec": round(n / dt, 1), "imgsz": imgsz}


def main(imgsz=640, n_imgs=64, src_imgsz=1280):
    from tests.helpers import make_shape_dataset

    out = ROOT / "runs"
    ds = out / "loader_bench_ds"
    # source images LARGER than the train imgsz — the realistic case (COCO
    # sources are ~1080p); exercises the cache-after-resize path
    yaml_path = make_shape_dataset(ds, n_train=n_imgs, n_val=2, imgsz=src_imgsz, seed=0)
    rows = [bench(c, yaml_path, imgsz=imgsz) for c in (False, "ram", "disk")]
    # raw mode feeding the device-side augmentation stage: host does
    # decode+letterbox+pad only (the augmentation itself runs on-device
    # inside the train step, measured by bench_train.py)
    rows += [bench(c, yaml_path, imgsz=imgsz, device_augment=True)
             for c in (False, "ram", "disk")]
    rec = {"rows": rows, "host_cpus": __import__("os").cpu_count()}
    (out / "loader_bench.json").write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:3]])
