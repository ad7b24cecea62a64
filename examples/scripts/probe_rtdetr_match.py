#!/usr/bin/env python
"""Probe the RT-DETR training path on REAL data (VERDICT r4 next-#3):

Loads a checkpoint from the overfit-8 diagnostic, runs the training-mode
forward on the actual 8 images, and reports, per decoder layer:
  - auction assignment vs scipy linear_sum_assignment cost (relative gap)
  - matched-pair IoU (what the matcher hands the loss)
  - best-achievable IoU per GT over all queries (can the model represent it?)
  - score stats of matched vs unmatched queries

This separates "matcher broken" / "decoder can't fit" / "classification
doesn't follow the matching" without another 600-epoch run.

Usage: JAX_PLATFORMS=cpu python examples/scripts/probe_rtdetr_match.py [ckpt]
"""
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


def main(ckpt_path=None):
    from yolo_contour_regression_tpu.engine.model import YOLO
    from yolo_contour_regression_tpu.models.rtdetr.val import RTDETRValidator
    from yolo_contour_regression_tpu.cfg import get_cfg
    from yolo_contour_regression_tpu.models.utils.loss import (
        hungarian_assign, match_cost)
    from yolo_contour_regression_tpu.ops.boxes import bbox_iou, xywh2xyxy

    ckpt_path = ckpt_path or str(
        ROOT / "runs/diag_rtdetr_overfit/train/weights/last.ckpt")
    data_yaml = ROOT / "runs/diag_rtdetr_overfit/dataset.yaml"
    if not data_yaml.exists():
        # diag writes the yaml inside its out dir
        cands = list((ROOT / "runs/diag_rtdetr_overfit").glob("*.yaml")) + list(
            (ROOT / "runs/diag_rtdetr_overfit/dataset").glob("*.yaml"))
        data_yaml = cands[0]
    m = YOLO(ckpt_path, task="rtdetr")
    args = get_cfg(overrides={"task": "rtdetr", "mode": "val", "imgsz": 96,
                              "batch": 8, "data": str(data_yaml)})
    v = RTDETRValidator(args=args)
    loader = v.build_loader(None if not data_yaml else __import__(
        "yolo_contour_regression_tpu.data.utils", fromlist=["check_det_dataset"]
    ).check_det_dataset(str(data_yaml)))

    model = m.model
    variables = m.variables
    report = {}
    for batch in loader:
        images = jnp.asarray(batch["img"])
        gt_boxes = jnp.asarray(batch["bboxes"], jnp.float32)
        gt_cls = jnp.asarray(batch["cls"], jnp.int32)
        mask_gt = jnp.asarray(batch["mask_gt"], bool)
        outs, _ = model.raw_forward(variables, images, train=True)
        dec_b, dec_s, enc_b, enc_s = outs
        L = dec_b.shape[0]
        n_valid = mask_gt.sum(-1)
        for layer in [0, L - 1]:
            pb, pl = dec_b[layer], dec_s[layer]
            cost = match_cost(pb, pl, gt_boxes, gt_cls, mask_gt)
            assign = np.asarray(hungarian_assign(cost, n_valid))
            cost_np = np.asarray(cost)
            B = cost_np.shape[0]
            gaps, match_ious, best_ious, m_scores, u_scores = [], [], [], [], []
            for b in range(B):
                nv = int(n_valid[b])
                if nv == 0:
                    continue
                c = cost_np[b][:, :nv]  # (Q, nv)
                r, col = linear_sum_assignment(c.T)  # rows=gt, cols=query
                oracle_cost = c.T[r, col].sum()
                auc_cost = sum(c.T[g, assign[b, g]] for g in range(nv))
                gaps.append(float((auc_cost - oracle_cost) /
                                  max(abs(oracle_cost), 1e-6)))
                iou_all = np.asarray(bbox_iou(
                    xywh2xyxy(gt_boxes[b][:nv, None, :]),
                    xywh2xyxy(pb[b][None if pb[b].ndim == 1 else slice(None)][None, :, :]
                              if False else pb[b][None, :, :]),
                    xywh=False))  # (nv, Q)
                for g in range(nv):
                    match_ious.append(float(iou_all[g, assign[b, g]]))
                    best_ious.append(float(iou_all[g].max()))
                prob = np.asarray(jax.nn.sigmoid(pl[b]))
                mq = assign[b, :nv]
                sel = prob[mq, np.asarray(gt_cls[b][:nv])]
                m_scores += sel.tolist()
                mask_un = np.ones(prob.shape[0], bool)
                mask_un[mq] = False
                u_scores.append(float(prob[mask_un].max(-1).mean()))
            report[f"layer{layer}"] = {
                "auction_vs_scipy_relgap": float(np.mean(gaps)),
                "matched_iou_mean": float(np.mean(match_ious)),
                "matched_iou_min": float(np.min(match_ious)),
                "best_iou_mean": float(np.mean(best_ious)),
                "matched_score_mean": float(np.mean(m_scores)),
                "matched_score_min": float(np.min(m_scores)),
                "unmatched_maxscore_mean": float(np.mean(u_scores)),
            }
        break  # one batch of 8 covers the whole overfit set
    print(json.dumps(report, indent=2))
    out = ROOT / "runs/probe_rtdetr_match.json"
    out.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
