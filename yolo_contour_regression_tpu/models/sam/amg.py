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
    """(N, H, W) bool -> (N, 4) xyxy; empty masks give zeros."""
    N, H, W = masks.shape
    out = np.zeros((N, 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if len(xs):
            out[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return out
