"""Polar contour geometry — the fork's core IP, rebuilt as fixed-shape jnp.

Behavioral contract (verified against the reference):
  - 36 rays at 10 deg spacing, angles measured from +x axis, y-down image frame
    (reference head.py:466-485 ``distance2mask``).
  - GT rays from a 360-point contour about an anchor: per target angle take the
    top-4 contour points nearest in circular angle difference, use the MAX
    distance among them; if even the nearest point is > 3 deg away the ray is
    invisible -> 1e-6 (reference tal.py:1178-1193 / tal.py:1261-1277).
  - Polar MaskIoU = sum(min)/sum(max) over the 36 rays (reference tal.py:1445).
  - Polar centerness = sqrt(min(rays)/max(rays)) (reference tal.py:1220).

Everything is shaped statically and vectorized so XLA can fuse and tile it; the
angle-binning hot loop is exposed both dense (small pair counts) and chunked
(via lax.map) so HBM stays bounded at training batch sizes.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

NUM_RAYS = 36
RAY_STEP_DEG = 360 // NUM_RAYS  # 10 degrees
NUM_CONTOUR_POINTS = 360
ANGLE_TOPK = 4  # nearest-angle contour points kept per ray bin
ANGLE_GAP_DEG = 3.0  # min-angle-gap cutoff: beyond this the ray is invisible
RAY_EPS = 1e-6  # invisible-ray sentinel / clamp
VALID_RAY_THRESH = 1.0  # decode-time visibility threshold (head.py:482)


def ray_angles(dtype=jnp.float32) -> jnp.ndarray:
    """(36,) ray angles in radians: 0, 10deg, ..., 350deg."""
    return jnp.arange(0, 360, RAY_STEP_DEG, dtype=dtype) * (math.pi / 180.0)


def ray_cos_sin(dtype=jnp.float32):
    a = ray_angles(dtype)
    return jnp.cos(a), jnp.sin(a)


def make_anchors(feat_hw, strides, grid_cell_offset=0.5, dtype=jnp.float32):
    """Anchor centers in grid units + per-anchor stride.

    feat_hw: list of (h, w) static ints per FPN level; strides: list of ints.
    Returns anchor_points (A, 2) xy in grid units, stride_tensor (A, 1).
    Mirrors reference tal.py make_anchors (row-major y-then-x flattening).
    """
    points, stride_t = [], []
    for (h, w), s in zip(feat_hw, strides):
        sx = (jnp.arange(w, dtype=dtype) + grid_cell_offset)[None, :].repeat(h, axis=0)
        sy = (jnp.arange(h, dtype=dtype) + grid_cell_offset)[:, None].repeat(w, axis=1)
        points.append(jnp.stack([sx, sy], -1).reshape(-1, 2))
        stride_t.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(points, 0), jnp.concatenate(stride_t, 0)


def decode_rays(rays, anchor_points_px):
    """Rays -> contour points, validity, and enclosing box.

    rays: (..., A, 36) ray distances already in pixels (stride-scaled).
    anchor_points_px: (A, 2) or broadcastable (..., A, 2) anchor centers, px.
    Returns (points (..., A, 36, 2), valid (..., A, 36) bool, boxes (..., A, 4) xyxy).
    Reference head.py:461-492: clamp to 1e-6, valid = d > 1, box = min/max over
    all 36 decoded points (visible or not).
    """
    rays = jnp.clip(rays, RAY_EPS, None)
    cos, sin = ray_cos_sin(rays.dtype)
    cx = anchor_points_px[..., 0:1]
    cy = anchor_points_px[..., 1:2]
    segx = rays * cos + cx  # (..., A, 36)
    segy = rays * sin + cy
    valid = rays > VALID_RAY_THRESH
    boxes = jnp.stack(
        [segx.min(-1), segy.min(-1), segx.max(-1), segy.max(-1)], axis=-1
    )
    points = jnp.stack([segx, segy], axis=-1)
    return points, valid, boxes


def decode_ray_boxes(rays, anchor_points_px):
    """Boxes ONLY from rays — no (..., A, 36, 2) points materialization.

    Same math as ``decode_rays`` but segx/segy feed straight into min/max
    reduces, so XLA fuses the trig + reduce and HBM sees just the (..., A, 4)
    result. This is the pre-NMS half of the lazy decode path
    (nn/modules/head.py decode_polar_lazy): at val/bench anchor counts
    (A=8400) the full points tensor is 72 floats/anchor of pure bandwidth,
    28x more than the post-NMS survivor set ever needs."""
    rays = jnp.clip(rays, RAY_EPS, None)
    cos, sin = ray_cos_sin(rays.dtype)
    segx = rays * cos + anchor_points_px[..., 0:1]
    segy = rays * sin + anchor_points_px[..., 1:2]
    return jnp.stack(
        [segx.min(-1), segy.min(-1), segx.max(-1), segy.max(-1)], axis=-1
    )


def point_angles_deg(points, center):
    """Angle in [0, 360) degrees of each point about center (y-down frame).

    points (..., N, 2), center (..., 2) -> (..., N). Reference tal.py:1286-1301.
    """
    v = points - center[..., None, :]
    ang = jnp.arctan2(v[..., 1], v[..., 0]) * (180.0 / math.pi)
    return jnp.where(ang < 0, ang + 360.0, ang)


def _gt_rays_dense(contour, center):
    """Exact angle-binning for one (contour, center) pair batch.

    contour (..., 360, 2), center (..., 2) -> rays (..., 36).
    """
    ang = point_angles_deg(contour, center)  # (..., 360)
    theta = jnp.arange(0, 360, RAY_STEP_DEG, dtype=ang.dtype)  # (36,)
    diff = jnp.abs(ang[..., None, :] - theta[..., :, None])  # (..., 36, 360)
    diff = jnp.where(diff > 180.0, 360.0 - diff, diff)
    # top-4 nearest by angle; lax.top_k is ascending-by-negation
    neg_diff_top, idx = jax.lax.top_k(-diff, ANGLE_TOPK)  # (..., 36, 4)
    min_gap = -neg_diff_top[..., 0]
    dist = jnp.linalg.norm(contour - center[..., None, :], axis=-1)  # (..., 360)
    dist_k = jnp.take_along_axis(
        jnp.broadcast_to(dist[..., None, :], diff.shape), idx, axis=-1
    )  # (..., 36, 4)
    rays = jnp.where(min_gap[..., None] > ANGLE_GAP_DEG, RAY_EPS, dist_k).max(-1)
    return jnp.clip(rays, RAY_EPS, None)


def gt_rays_from_contour(contour, center, chunk: int = 4096):
    """GT ray construction, memory-bounded.

    contour (P, 360, 2), center (P, 2) -> (P, 36). P is a static pair count;
    computed in `chunk`-sized slabs via lax.map so the (chunk, 36, 360) diff
    tensor is the peak intermediate, independent of P.
    """
    P = contour.shape[0]
    if P <= chunk:
        return _gt_rays_dense(contour, center)
    pad = (-P) % chunk
    contour_p = jnp.pad(contour, ((0, pad), (0, 0), (0, 0)))
    center_p = jnp.pad(center, ((0, pad), (0, 0)))
    n = (P + pad) // chunk
    out = jax.lax.map(
        lambda args: _gt_rays_dense(*args),
        (
            contour_p.reshape(n, chunk, NUM_CONTOUR_POINTS, 2),
            center_p.reshape(n, chunk, 2),
        ),
    )
    return out.reshape(-1, NUM_RAYS)[:P]


def polar_mask_iou(rays_a, rays_b, eps: float = RAY_EPS):
    """sum(min)/sum(max) over rays. (..., 36) x (..., 36) -> (...,).

    Reference tal.py MaskIOU: min is clamped to 1e-6 before the ratio.
    """
    mx = jnp.maximum(rays_a, rays_b)
    mn = jnp.clip(jnp.minimum(rays_a, rays_b), eps, None)
    return mn.sum(-1) / mx.sum(-1)


def polar_centerness(rays, eps: float = 0.0):
    """sqrt(min/max) of the GT rays (reference tal.py:1220)."""
    return jnp.sqrt(rays.min(-1) / (rays.max(-1) + eps))


def mask_iou_loss(pred_rays, target_rays, weight, norm, eps: float = RAY_EPS):
    """Polar IoU loss: log(sum(max)/sum(min)) * weight, summed / norm.

    pred_rays/target_rays (..., 36), weight (...,) zero outside fg.
    Reference loss.py:109-127 MaskIOULoss.
    """
    mx = jnp.maximum(pred_rays, target_rays)
    mn = jnp.clip(jnp.minimum(pred_rays, target_rays), eps, None)
    per = jnp.log(mx.sum(-1) / mn.sum(-1))
    return (per * weight).sum() / norm


@partial(jax.jit, static_argnames=("num_points",))
def resample_contour(points, valid, num_points: int = NUM_CONTOUR_POINTS):
    """Uniformly resample a closed polygon to `num_points` by arc position.

    points (N, 2) with a validity mask (first V entries valid, V = valid.sum());
    resampling follows the reference's resample_segments (ops.py:676): linear
    interpolation at num_points evenly spaced fractional indices over the
    closed polyline (first vertex appended at the end).
    """
    n = points.shape[0]
    count = valid.sum()
    # closed polyline: index i in [0, count] maps to points[i % count]
    xp = jnp.linspace(0.0, 1.0, num_points, dtype=points.dtype) * count.astype(points.dtype)
    i0 = jnp.clip(jnp.floor(xp).astype(jnp.int32), 0, None)
    frac = xp - i0.astype(points.dtype)
    g0 = jnp.take(points, jnp.mod(i0, jnp.maximum(count, 1)), axis=0)
    g1 = jnp.take(points, jnp.mod(i0 + 1, jnp.maximum(count, 1)), axis=0)
    out = g0 + (g1 - g0) * frac[:, None]
    return jnp.where(count > 0, out, jnp.zeros((num_points, 2), points.dtype))
