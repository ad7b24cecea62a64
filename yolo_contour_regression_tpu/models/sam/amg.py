"""Automatic mask generation utilities (reference models/sam/amg.py:311):
grid point sampling, crop boxes, stability score, batched mask filtering."""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) evenly spaced normalized points (reference build_point_grid)."""
    offset = 1 / (2 * n_per_side)
    side = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(side, side)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], -1)


def build_all_layer_point_grids(n_per_side: int, n_layers: int, scale_per_layer: int):
    return [
        point_grid(int(n_per_side / (scale_per_layer**i))) for i in range(n_layers + 1)
    ]


def generate_crop_boxes(
    im_size: Tuple[int, int], n_layers: int, overlap_ratio: float = 512 / 1500
):
    """Multi-scale crop boxes (reference amg.py generate_crop_boxes)."""
    boxes, layer_idxs = [], []
    h, w = im_size
    boxes.append([0, 0, w, h])
    layer_idxs.append(0)

    def crop_len(orig, n_crops, overlap):
        return int(np.ceil((overlap * (n_crops - 1) + orig) / n_crops))

    for i in range(n_layers):
        n = 2 ** (i + 1)
        overlap = int(overlap_ratio * min(h, w) * (2 / n))
        cw = crop_len(w, n, overlap)
        ch = crop_len(h, n, overlap)
        x0s = [int((cw - overlap) * k) for k in range(n)]
        y0s = [int((ch - overlap) * k) for k in range(n)]
        for x0 in x0s:
            for y0 in y0s:
                boxes.append([x0, y0, min(x0 + cw, w), min(y0 + ch, h)])
                layer_idxs.append(i + 1)
    return boxes, layer_idxs


def stability_score(masks: np.ndarray, mask_threshold: float, offset: float) -> np.ndarray:
    """IoU between high/low-threshold binarizations (reference amg.py)."""
    hi = (masks > (mask_threshold + offset)).sum((-1, -2)).astype(np.float64)
    lo = (masks > (mask_threshold - offset)).sum((-1, -2)).astype(np.float64)
    return hi / np.maximum(lo, 1)


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) bool -> (N, 4) xyxy; empty masks give zeros (vectorized:
    row/col any-reductions + argmax from both ends, no per-mask loop)."""
    N, H, W = masks.shape
    if N == 0:
        return np.zeros((0, 4), np.float32)
    rows = masks.any(2)  # (N, H)
    cols = masks.any(1)  # (N, W)
    y0 = rows.argmax(1)
    y1 = H - rows[:, ::-1].argmax(1)
    x0 = cols.argmax(1)
    x1 = W - cols[:, ::-1].argmax(1)
    out = np.stack([x0, y0, x1, y1], -1).astype(np.float32)
    out[~rows.any(1)] = 0.0
    return out


def is_box_near_crop_edge(boxes_xyxy: np.ndarray, crop_box, orig_box,
                          atol: float = 20.0) -> np.ndarray:
    """True where a box (full-image coords) touches its crop's edge without
    also touching the image edge (reference amg.py is_box_near_crop_edge) —
    those detections are partial objects the next crop sees whole."""
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    boxes = np.asarray(boxes_xyxy, np.float32)
    near_crop = np.abs(boxes - crop[None]) <= atol
    near_orig = np.abs(boxes - orig[None]) <= atol
    return (near_crop & ~near_orig).any(1)


def nms_boxes(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float) -> np.ndarray:
    """Greedy box NMS on host (the AMG filter stage works on the dynamic
    survivor set, so the fixed-shape device NMS in ops/nms.py doesn't fit).
    Returns kept indices in descending-score order."""
    if len(boxes) == 0:
        return np.zeros(0, np.int64)
    boxes = np.asarray(boxes, np.float32)
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    order = np.argsort(-np.asarray(scores))
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        rest = order[1:]
        x0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, np.int64)


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str):
    """Remove sub-threshold connected holes or islands from one bool mask
    (reference amg.py remove_small_regions). Returns (mask, changed)."""
    import cv2

    assert mode in ("holes", "islands")
    invert = mode == "holes"
    work = (mask ^ invert).astype(np.uint8)
    n, regions, stats, _ = cv2.connectedComponentsWithStats(work, 8)
    sizes = stats[1:, -1]  # label 0 is background
    small = [i + 1 for i, sz in enumerate(sizes) if sz < area_thresh]
    if not small:
        return mask.astype(bool), False
    fill = [0] + small
    if not invert:
        # islands mode: if everything is small, keep the largest region
        fill = [i for i in range(n) if i not in fill] or [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True
