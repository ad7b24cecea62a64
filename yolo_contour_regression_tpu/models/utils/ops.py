"""DETR-family training ops — contrastive denoising (CDN) group construction.

Re-implementation of the reference ``models/utils/ops.py:260 get_cdn_group``
in fixed shapes for XLA: instead of concatenating the batch's ragged GT lists,
the padded (B, N) GT tensors are copied into ``num_group`` groups of
(positive, negative) pairs — dn query count = 2 * N * num_group is STATIC,
padded GT slots ride along and are masked out of the dn loss. Noise:

  - labels: with probability ``cls_noise_ratio * 0.5`` a GT's class is
    replaced by a uniformly random class (reference ops.py:295).
  - boxes (positive half): center/size jittered within +-0.5 * wh *
    ``box_noise_scale`` (stays overlapping its GT).
  - boxes (negative half): pushed 0.5..1.0 * wh outside (reference
    rand_part[negative] += 1.0), teaching the decoder to reject near-misses.

The group structure is encoded in the ARRAY SHAPES (B, num_group, 2, N, ...),
so the decoder and the dn loss recover it without dynamic metadata.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def get_cdn_group(
    batch: Dict[str, jnp.ndarray],
    nc: int,
    key: jax.Array,
    num_dn: int = 100,
    cls_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
) -> Optional[Dict[str, jnp.ndarray]]:
    """batch {'cls' (B,N), 'bboxes' (B,N,4) cxcywh-norm, 'mask_gt' (B,N)} ->
    dn dict {'labels' (B,G,2,N) int32, 'boxes_logit' (B,G,2,N,4)} with
    G = max(num_dn // N, 1) groups. Returns None when num_dn <= 0."""
    if num_dn <= 0:
        return None
    gt_cls = batch["cls"].astype(jnp.int32)
    gt_boxes = batch["bboxes"].astype(jnp.float32)
    B, N = gt_cls.shape
    G = max(num_dn // max(N, 1), 1)

    k_cls, k_newcls, k_sign, k_part, k_jit = jax.random.split(key, 5)
    labels = jnp.broadcast_to(gt_cls[:, None, None, :], (B, G, 2, N))
    boxes = jnp.broadcast_to(gt_boxes[:, None, None, :, :], (B, G, 2, N, 4))

    if cls_noise_ratio > 0:
        flip = jax.random.uniform(k_cls, (B, G, 2, N)) < (cls_noise_ratio * 0.5)
        new_cls = jax.random.randint(k_newcls, (B, G, 2, N), 0, nc)
        labels = jnp.where(flip, new_cls, labels)

    if box_noise_scale > 0:
        xyxy = jnp.concatenate(
            [boxes[..., :2] - boxes[..., 2:] / 2, boxes[..., :2] + boxes[..., 2:] / 2], -1
        )
        diff = jnp.concatenate([boxes[..., 2:], boxes[..., 2:]], -1) * 0.5  # (..., 4)
        sign = jax.random.randint(k_sign, xyxy.shape, 0, 2) * 2.0 - 1.0
        part = jax.random.uniform(k_part, xyxy.shape)
        # negative half (index 1 on the pos/neg axis) pushed outside the box
        neg = jnp.zeros((B, G, 2, N, 1)).at[:, :, 1].set(1.0)
        part = part + neg
        noised = xyxy + sign * part * diff * box_noise_scale
        noised = jnp.clip(noised, 0.0, 1.0)
        boxes = jnp.concatenate(
            [(noised[..., :2] + noised[..., 2:]) / 2, noised[..., 2:] - noised[..., :2]], -1
        )

    return {
        "labels": labels,
        "boxes_logit": inverse_sigmoid(boxes),
    }
