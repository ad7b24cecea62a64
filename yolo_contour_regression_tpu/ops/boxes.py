"""Box geometry ops — pure jnp, fixed-shape, fully jittable.

TPU-native re-implementation of the box toolbox the reference keeps in
``ultralytics/utils/ops.py`` (xywh2xyxy ops.py:503, xyxy2xywh ops.py:484,
clip_boxes ops.py:429, scale_boxes ops.py:97) and ``utils/metrics.py``
(bbox_iou metrics.py:61, box_iou metrics.py:133-area form). Everything here is
vectorized over arbitrary leading dims, no Python branching on data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center-xywh -> corner-xyxy."""
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner-xyxy -> center-xywh."""
    tl, br = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(tl + br) * 0.5, br - tl], axis=-1)


def ltwh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) top-left-wh -> corner-xyxy."""
    tl, wh = x[..., :2], x[..., 2:4]
    return jnp.concatenate([tl, tl + wh], axis=-1)


def xyxy2ltwh(x: jnp.ndarray) -> jnp.ndarray:
    tl, br = x[..., :2], x[..., 2:4]
    return jnp.concatenate([tl, br - tl], axis=-1)


def box_area(box: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> area."""
    return jnp.clip(box[..., 2] - box[..., 0], 0, None) * jnp.clip(
        box[..., 3] - box[..., 1], 0, None
    )


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Pairwise IoU. box1 (..., N, 4), box2 (..., M, 4) xyxy -> (..., N, M)."""
    a = box1[..., :, None, :]
    b = box2[..., None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:4], b[..., 2:4])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    union = box_area(box1)[..., :, None] + box_area(box2)[..., None, :] - inter
    return inter / (union + eps)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = EPS,
) -> jnp.ndarray:
    """Elementwise IoU / GIoU / DIoU / CIoU between aligned boxes.

    box1, box2: (..., 4), broadcastable. Returns (...,). Mirrors the IoU-family
    semantics of reference metrics.py:61-131 but as branch-free jnp (flags are
    Python-static so XLA sees a single fused graph per variant).
    """
    if xywh:
        box1, box2 = xywh2xyxy(box1), xywh2xyxy(box2)
    b1x1, b1y1, b1x2, b1y2 = (box1[..., i] for i in range(4))
    b2x1, b2y1, b2x2, b2y2 = (box2[..., i] for i in range(4))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (GIoU or DIoU or CIoU):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # enclosing width
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if GIoU:
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    c2 = cw**2 + ch**2 + eps  # enclosing diagonal squared
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    if DIoU:
        return iou - rho2 / c2
    # CIoU
    v = (4 / jnp.pi**2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
    # alpha is a constant wrt the loss gradient (reference computes it under
    # torch.no_grad(), metrics.py:126)
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - (rho2 / c2 + v * alpha)


def bbox_ioa(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Intersection over box2 area. box1 (N,4), box2 (M,4) -> (N, M)."""
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:4], box2[None, :, 2:4])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    return inter / (box_area(box2)[None, :] + eps)


def scale_boxes(boxes: jnp.ndarray, ratio_pad: jnp.ndarray, ori_shape: jnp.ndarray) -> jnp.ndarray:
    """Inverse-letterbox xyxy boxes to native image space, clipped
    (reference utils/ops.py:872 scale_boxes).

    boxes (..., M, 4) in letterbox px; ratio_pad (..., 3) = (gain, pad_x,
    pad_y); ori_shape (..., 2) = (h0, w0). Leading dims broadcast (use (B,...)
    for a batch)."""
    gain = ratio_pad[..., 0][..., None, None]
    pad = ratio_pad[..., 1:3]
    pad4 = jnp.concatenate([pad, pad], -1)[..., None, :]
    out = (boxes - pad4) / gain
    wh0 = ori_shape[..., ::-1]
    lim = jnp.concatenate([wh0, wh0], -1)[..., None, :]
    return jnp.clip(out, 0.0, lim)


def scale_coords(coords: jnp.ndarray, ratio_pad: jnp.ndarray) -> jnp.ndarray:
    """Inverse-letterbox xy point sets to native image space (reference
    utils/ops.py:898 scale_coords; no clipping — polygon vertices may sit
    outside the image and still rasterize correctly).

    coords (..., P, 2) letterbox px; ratio_pad (..., 3) broadcast over the
    leading dims (a (B, 3) batch pairs with (B, N, P, 2) coords)."""
    extra = coords.ndim - ratio_pad.ndim - 1
    gain = ratio_pad[..., 0].reshape(ratio_pad.shape[:-1] + (1,) * (extra + 2))
    pad = ratio_pad[..., 1:3].reshape(ratio_pad.shape[:-1] + (1,) * (extra + 1) + (2,))
    return (coords - pad) / gain


def clip_boxes(boxes: jnp.ndarray, hw) -> jnp.ndarray:
    """Clip xyxy boxes to image bounds (h, w)."""
    h, w = hw
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def clip_coords(coords: jnp.ndarray, hw) -> jnp.ndarray:
    """Clip (..., 2) xy points to image bounds (h, w)."""
    h, w = hw
    return jnp.stack(
        [jnp.clip(coords[..., 0], 0, w), jnp.clip(coords[..., 1], 0, h)], axis=-1
    )


def letterbox_ratio_pad(from_hw, to_hw) -> jnp.ndarray:
    """(gain, pad_x, pad_y) of a centered letterbox from native ``to_hw``
    into model-input ``from_hw`` (reference ops.py:872 gain/pad recovery)."""
    gain = min(from_hw[0] / to_hw[0], from_hw[1] / to_hw[1])
    pad_x = (from_hw[1] - to_hw[1] * gain) / 2
    pad_y = (from_hw[0] - to_hw[0] * gain) / 2
    return jnp.asarray([gain, pad_x, pad_y], jnp.float32)


def dist2bbox(distance, anchor_points, xywh=True, axis=-1):
    """ltrb distances + anchor points -> boxes (reference tal.py dist2bbox)."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points, bbox, reg_max):
    """xyxy boxes -> ltrb distances clamped to reg_max (reference tal.py bbox2dist)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1),
        0,
        reg_max - 0.01,
    )
