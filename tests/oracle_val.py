"""Independent numpy/cv2 oracle of the REFERENCE's polar val protocol.

Faithful re-implementation (not an import) of the reference fork's validation
math, used by tests/test_map_parity.py to check the repo validator's mAP
against the reference's own protocol on identical predictions:

  - multi-label NMS with class-offset greedy suppression
    (reference utils/ops.py:285-426: conf 0.001, iou 0.7, max_wh 7680,
    multi_label=True at val, torchvision.ops.nms semantics)
  - contour -> bitmap rasterization via cv2.fillPoly of the valid contour
    points (reference utils/ops.py:768 process_mask — the fillPoly loop the
    reference left commented out, re-enabled as SURVEY.md §2.1 prescribes)
  - native-space box scaling (reference utils/ops.py:872 scale_boxes)
  - TP matching at 10 IoUs with the unique-match dedupe
    (reference models/yolo/segment/val.py:226 _process_batch)
  - 101-point interpolated AP (reference utils/metrics.py:385 compute_ap,
    :418 ap_per_class)

Everything is plain numpy + cv2; no torch/torchvision needed.
"""
from __future__ import annotations

import cv2
import numpy as np

IOUV = np.linspace(0.5, 0.95, 10)
MAX_WH = 7680.0


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) xyxy vs (M,4) -> (N,M)."""
    area_a = (a[:, 2] - a[:, 0]).clip(0) * (a[:, 3] - a[:, 1]).clip(0)
    area_b = (b[:, 2] - b[:, 0]).clip(0) * (b[:, 3] - b[:, 1]).clip(0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clip(0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None] - inter + 1e-7)


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> np.ndarray:
    """torchvision.ops.nms semantics: descending-score greedy suppression."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        ious = box_iou(boxes[i][None], boxes[rest])[0]
        order = rest[ious <= iou_thres]
    return np.asarray(keep, np.int64)


def oracle_nms(pred_ca: np.ndarray, nc: int, conf_thres: float = 0.001,
               iou_thres: float = 0.7, max_det: int = 300,
               max_nms: int = 30000) -> np.ndarray:
    """Reference val-mode NMS for ONE image.

    pred_ca: (4+nc+108, A) — polar layout, boxes already xyxy
    (reference removed xywh2xyxy, ops.py:363).
    Returns (n, 6+108): x1 y1 x2 y2 conf cls extras...
    """
    x = pred_ca.T.astype(np.float32)  # (A, C)
    box = x[:, :4]
    cls = x[:, 4:4 + nc]
    extra = x[:, 4 + nc:]
    # candidate gate then multi-label expansion (reference ops.py:349, 385)
    keep_any = cls.max(1) > conf_thres
    box, cls, extra = box[keep_any], cls[keep_any], extra[keep_any]
    i, j = np.where(cls > conf_thres)
    if i.size == 0:
        return np.zeros((0, 6 + extra.shape[1]), np.float32)
    rows = np.concatenate(
        [box[i], cls[i, j, None], j[:, None].astype(np.float32), extra[i]], 1
    )
    if rows.shape[0] > max_nms:
        rows = rows[np.argsort(-rows[:, 4])[:max_nms]]
    c = rows[:, 5:6] * MAX_WH
    keep = greedy_nms(rows[:, :4] + c, rows[:, 4], iou_thres)[:max_det]
    return rows[keep]


def fill_contour_masks(extras: np.ndarray, h: int, w: int) -> np.ndarray:
    """(n, 108) [36x, 36y, 36 select] -> (n, h, w) uint8 via cv2.fillPoly of
    the valid points (reference process_mask ops.py:768, fill enabled)."""
    n = extras.shape[0]
    xx, yy, sel = extras[:, :36], extras[:, 36:72], extras[:, 72:108]
    masks = np.zeros((n, h, w), np.uint8)
    for k in range(n):
        on = sel[k] > 0.5
        if on.sum() < 3:
            continue
        pts = np.stack([xx[k][on], yy[k][on]], -1).astype(np.int32)
        cv2.fillPoly(masks[k], [pts], color=1)
    return masks


def scale_boxes_native(boxes: np.ndarray, letter_shape, ori_shape,
                       ratio_pad) -> np.ndarray:
    """Reference ops.py:872: undo letterbox gain/pad, clip to native."""
    gain, padx, pady = ratio_pad
    out = boxes.copy()
    out[:, [0, 2]] = (out[:, [0, 2]] - padx) / gain
    out[:, [1, 3]] = (out[:, [1, 3]] - pady) / gain
    h, w = ori_shape
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, w)
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, h)
    return out


def match_at_ious(iou: np.ndarray, pred_cls: np.ndarray,
                  gt_cls: np.ndarray) -> np.ndarray:
    """(M gt, N pred) IoU -> (N, 10) bool TP matrix
    (reference segment/val.py:226 _process_batch unique-match logic)."""
    correct = np.zeros((pred_cls.shape[0], IOUV.size), bool)
    cc = gt_cls[:, None] == pred_cls[None, :]
    for t in range(IOUV.size):
        gi, pi = np.where((iou >= IOUV[t]) & cc)
        if gi.size:
            m = np.stack([gi, pi, iou[gi, pi]], 1)
            if gi.size > 1:
                m = m[m[:, 2].argsort()[::-1]]
                m = m[np.unique(m[:, 1], return_index=True)[1]]
                m = m[np.unique(m[:, 0], return_index=True)[1]]
            correct[m[:, 1].astype(int), t] = True
    return correct


def compute_ap(recall: np.ndarray, precision: np.ndarray) -> float:
    """101-point interpolated AP (reference metrics.py:385)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    return float(np.trapezoid(np.interp(x, mrec, mpre), x))


def ap_per_class(tp: np.ndarray, conf: np.ndarray, pred_cls: np.ndarray,
                 target_cls: np.ndarray, eps: float = 1e-16) -> np.ndarray:
    """(N,10) TP matrix -> per-class AP (nc_seen, 10)
    (reference metrics.py:418)."""
    order = np.argsort(-conf)
    tp, conf, pred_cls = tp[order], conf[order], pred_cls[order]
    classes, counts = np.unique(target_cls, return_counts=True)
    ap = np.zeros((classes.size, tp.shape[1]))
    for ci, c in enumerate(classes):
        sel = pred_cls == c
        n_l, n_p = counts[ci], int(sel.sum())
        if n_p == 0 or n_l == 0:
            continue
        fpc = (1 - tp[sel]).cumsum(0)
        tpc = tp[sel].cumsum(0)
        recall = tpc / (n_l + eps)
        precision = tpc / (tpc + fpc)
        for j in range(tp.shape[1]):
            ap[ci, j] = compute_ap(recall[:, j], precision[:, j])
    return ap


class OracleAccumulator:
    """Streams per-image stats exactly like the reference validator."""

    def __init__(self):
        self.stats = []  # (correct_b, correct_m, conf, pred_cls, gt_cls)

    def update(self, pred_rows: np.ndarray, gt_cls: np.ndarray,
               gt_boxes_native: np.ndarray, gt_segments_px: np.ndarray,
               letter_shape, ori_shape, ratio_pad):
        """pred_rows: oracle_nms output (letterbox px). GT: native-space
        boxes, letterbox-px 360-pt contours."""
        npr, nl = pred_rows.shape[0], gt_cls.shape[0]
        if npr == 0:
            if nl:
                z = np.zeros((0, IOUV.size), bool)
                self.stats.append((z, z, np.zeros(0), np.zeros(0), gt_cls))
            return
        predn = pred_rows.copy()
        predn[:, :4] = scale_boxes_native(
            pred_rows[:, :4], letter_shape, ori_shape, ratio_pad
        )
        if nl == 0:
            z = np.zeros((npr, IOUV.size), bool)
            self.stats.append((z, z, pred_rows[:, 4], pred_rows[:, 5], gt_cls))
            return
        iou_b = box_iou(gt_boxes_native, predn[:, :4])
        correct_b = match_at_ious(iou_b, pred_rows[:, 5], gt_cls)

        h, w = letter_shape
        pm = fill_contour_masks(pred_rows[:, 6:], h, w).reshape(npr, -1)
        gm = np.zeros((nl, h, w), np.uint8)
        for k in range(nl):
            cv2.fillPoly(gm[k], [gt_segments_px[k].astype(np.int32)], color=1)
        gm = gm.reshape(nl, -1)
        inter = gm.astype(np.float64) @ pm.astype(np.float64).T
        union = gm.sum(1)[:, None] + pm.sum(1)[None] - inter
        iou_m = inter / (union + 1e-7)
        correct_m = match_at_ious(iou_m, pred_rows[:, 5], gt_cls)
        self.stats.append(
            (correct_b, correct_m, pred_rows[:, 4], pred_rows[:, 5], gt_cls)
        )

    def result(self):
        """-> dict with box/mask mAP50, mAP50-95."""
        if not self.stats:
            return {k: 0.0 for k in ("box_map", "box_map50", "mask_map", "mask_map50")}
        cb = np.concatenate([s[0] for s in self.stats])
        cm = np.concatenate([s[1] for s in self.stats])
        conf = np.concatenate([s[2] for s in self.stats])
        pc = np.concatenate([s[3] for s in self.stats])
        tc = np.concatenate([s[4] for s in self.stats])
        ap_b = ap_per_class(cb, conf, pc, tc)
        ap_m = ap_per_class(cm, conf, pc, tc)
        return {
            "box_map": float(ap_b.mean()) if ap_b.size else 0.0,
            "box_map50": float(ap_b[:, 0].mean()) if ap_b.size else 0.0,
            "mask_map": float(ap_m.mean()) if ap_m.size else 0.0,
            "mask_map50": float(ap_m[:, 0].mean()) if ap_m.size else 0.0,
        }
