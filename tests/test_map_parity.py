"""Cross-implementation mAP parity (VERDICT r2 next-#2): the repo validator
vs an independent numpy/cv2 oracle of the REFERENCE's own val protocol
(tests/oracle_val.py), fed the SAME trained checkpoint on the SAME val set.

The two protocols differ deliberately in ways that bound the gap:
  - oracle = reference: multi-label NMS, full-res letterbox-space fillPoly
    mask IoU;
  - repo = best-class NMS, native-space streaming polygon IoU on an
    R x R grid.
The measured deltas are asserted here and quoted in README.md."""
import json
import math
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
FDIR = ROOT / "runs" / "floor_seg160"

pytestmark = pytest.mark.skipif(
    not (FDIR / "best.ckpt").exists(),
    reason="committed seg160 floor checkpoint missing",
)


def _xywh2xyxy(b):
    return np.concatenate([b[..., :2] - b[..., 2:] / 2, b[..., :2] + b[..., 2:] / 2], -1)


@pytest.mark.slow
def test_map_matches_reference_protocol_oracle(tmp_path):
    import jax.numpy as jnp

    from tests.helpers import make_shape_dataset
    from tests.oracle_val import OracleAccumulator, oracle_nms, scale_boxes_native
    from yolo_contour_regression_tpu.cfg import get_cfg
    from yolo_contour_regression_tpu.data.build import build_dataloader, build_yolo_dataset
    from yolo_contour_regression_tpu.data.utils import check_det_dataset
    from yolo_contour_regression_tpu.engine.model import YOLO

    record = json.loads((FDIR / "floor.json").read_text())
    cfg = record["config"]
    imgsz = cfg["imgsz"]
    yaml_path = make_shape_dataset(
        tmp_path / "ds", n_train=cfg["n_train"], n_val=cfg["n_val"],
        imgsz=cfg["imgsz"], seed=cfg["seed"],
    )

    m = YOLO(str(FDIR / "best.ckpt"))
    model, variables = m.model, m.variables

    # ---- oracle pass: reference protocol on raw predictions --------------
    vcfg = get_cfg(dict(task="segment", imgsz=imgsz, batch=4, conf=0.001))
    data = check_det_dataset(str(yaml_path))
    ds = build_yolo_dataset(vcfg, data["val"], 4, data, mode="val")
    loader = build_dataloader(ds, 4, 2, shuffle=False, mode="val")

    acc = OracleAccumulator()
    for batch in loader:
        nv = int(batch.pop("n_valid", batch["img"].shape[0]))
        pred = np.asarray(model.predict(variables, jnp.asarray(batch["img"])))
        for bi in range(nv):
            rows = oracle_nms(pred[bi], nc=model.nc)
            gt_keep = batch["mask_gt"][bi]
            gt_cls = batch["cls"][bi][gt_keep].astype(np.float64)
            rp = batch["ratio_pad"][bi]  # (gain, padx, pady)
            ori = batch["ori_shape"][bi]
            gt_boxes_lb = _xywh2xyxy(batch["bboxes"][bi][gt_keep]) * imgsz
            gt_boxes_nat = scale_boxes_native(
                gt_boxes_lb, (imgsz, imgsz), ori, rp
            )
            gt_segs_px = batch["segments"][bi][gt_keep] * imgsz
            acc.update(rows, gt_cls, gt_boxes_nat, gt_segs_px,
                       (imgsz, imgsz), ori, rp)
    oracle = acc.result()

    # ---- repo validator on the same data ---------------------------------
    res = m.val(data=str(yaml_path), imgsz=imgsz, batch=4,
                project=str(tmp_path / "runs"))
    repo = {
        "box_map": res["metrics/mAP50-95(B)"],
        "mask_map": res["metrics/mAP50-95(M)"],
        "box_map50": res["metrics/mAP50(B)"],
        "mask_map50": res["metrics/mAP50(M)"],
    }

    deltas = {k: abs(repo[k] - oracle[k]) for k in repo}
    print(f"\noracle={oracle}\nrepo={repo}\ndeltas={deltas}")
    (ROOT / "runs" / "map_parity.json").write_text(json.dumps(
        {"oracle": oracle, "repo": repo,
         "deltas": {k: round(v, 4) for k, v in deltas.items()}}, indent=2,
    ))
    # both implementations must agree that the model is good...
    assert oracle["mask_map"] > 0.45 and repo["mask_map"] > 0.45
    # ...and with each other within protocol noise (multi-label NMS; the
    # val_mask_ratio=1 default rasters at full imgsz like the reference's
    # fillPoly protocol, so the old 0.016 raster-resolution slack is gone)
    assert deltas["box_map"] < 0.01, deltas
    assert deltas["mask_map"] < 0.008, deltas
    assert deltas["box_map50"] < 0.01, deltas
    assert deltas["mask_map50"] < 0.008, deltas
