"""On-device polygon rasterization (contour -> binary mask).

The reference *intended* to rasterize predicted 36-gon contours with
cv2.fillPoly but shipped the loop commented out (ops.py:796-818 returns zero
masks). Here rasterization is a first-class device op so inference and mask-mAP
never round-trip to host: a vectorized even-odd (crossing-number) fill —
identical to cv2.fillPoly semantics for simple polygons.

Ragged validity (invisible rays) is handled in fixed shape by collapsing each
invalid vertex onto its previous valid vertex; the resulting zero-length edges
contribute no crossings, so the filled region equals the polygon over the valid
vertices only — matching the reference's ``contour[disbool]`` indexing
(head.py commented debug code / ops.py:796).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def collapse_invalid_vertices(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Replace each invalid vertex with the nearest preceding valid vertex.

    points (..., V, 2), valid (..., V) bool. Invalid vertices before the first
    valid one wrap to the *last* valid vertex (circular), keeping the polygon
    closed. log2(V) doubling steps, fully vectorized.
    """
    V = points.shape[-2]
    idx = jnp.broadcast_to(jnp.arange(V), valid.shape)
    # self if valid else marker; fill markers by circular max-propagation of
    # "most recent valid index at or before i" computed on a doubled ring.
    ring_valid = jnp.concatenate([valid, valid], axis=-1)
    ring_idx = jnp.where(ring_valid, jnp.broadcast_to(jnp.arange(2 * V), ring_valid.shape), -1)
    step = 1
    while step < 2 * V:
        shifted = jnp.roll(ring_idx, step, axis=-1)
        mask = jnp.arange(2 * V) >= step
        ring_idx = jnp.where((ring_idx < 0) & mask, shifted, ring_idx)
        step *= 2
    src = jnp.mod(jnp.where(ring_idx[..., V:] >= 0, ring_idx[..., V:], idx), V)
    return jnp.take_along_axis(points, src[..., None], axis=-2)


def _fill_rows(pts: jnp.ndarray, py: jnp.ndarray, width: int):
    """Even-odd fill of one polygon (collapsed vertices, (V,2)) sampled at
    scan rows ``py`` ((R,1) float) x columns 0..width-1. Returns (R, width)."""
    x0, y0 = pts[:, 0], pts[:, 1]
    x1, y1 = jnp.roll(x0, -1), jnp.roll(y0, -1)
    px = jnp.arange(width, dtype=pts.dtype)[None, :]  # (1, W)

    # Edge crossing test per scan row: does edge (p0, p1) cross horizontal line
    # y = py, and at what x?
    def edge_contrib(carry, e):
        ex0, ey0, ex1, ey1 = e
        cond = (ey0 > py) != (ey1 > py)  # (R, 1)
        t = (py - ey0) / jnp.where(ey1 == ey0, 1.0, ey1 - ey0)
        xi = ex0 + t * (ex1 - ex0)  # (R, 1)
        cross = cond & (px < xi)  # (R, W)
        return carry ^ cross, None

    inside, _ = jax.lax.scan(
        edge_contrib, jnp.zeros((py.shape[0], width), bool), (x0, y0, x1, y1)
    )
    return inside


def fill_polygon(points: jnp.ndarray, valid: jnp.ndarray, height: int, width: int):
    """Rasterize one polygon to a (height, width) bool mask via even-odd rule.

    points (V, 2) float xy in pixel coords, valid (V,) bool vertex mask.
    Pixel centers at integer + 0.5 offsets? — we sample at integer coords to
    match cv2.fillPoly's inclusive behavior closely enough for mask IoU.
    """
    pts = collapse_invalid_vertices(points, valid)
    py = jnp.arange(height, dtype=points.dtype)[:, None]  # (H, 1)
    return _fill_rows(pts, py, width) & valid.any()


@partial(jax.jit, static_argnames=("height", "width", "block"))
def polygon_mask_iou(
    pts_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    pts_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    height: int,
    width: int,
    block: int = 32,
    eps: float = 1e-7,
):
    """Pairwise mask IoU between polygon sets A (N,Va,2)/(N,Va) and
    B (M,Vb,2)/(M,Vb) on a (height,width) raster grid WITHOUT materializing
    (N+M, H, W) masks: rasterize row blocks and accumulate intersection and
    areas with ``lax.scan``. Peak memory is O((N+M)·block·width), so the grid
    can be full resolution. Returns (N, M) float32 IoU.

    This is the device op behind COCO-protocol mask mAP: the reference
    matches masks via ``mask_iou`` on materialized bitmaps
    (utils/metrics.py:133, models/yolo/segment/val.py:226); here the
    rasterize+IoU is one fused streaming program.
    """
    f = jnp.float32
    pa = collapse_invalid_vertices(pts_a, valid_a)
    pb = collapse_invalid_vertices(pts_b, valid_b)
    ok_a = valid_a.any(-1)  # (N,)
    ok_b = valid_b.any(-1)  # (M,)
    block = min(block, height)
    n_blocks = (height + block - 1) // block
    raster_a = jax.vmap(lambda p, py: _fill_rows(p, py, width), in_axes=(0, None))
    raster_b = jax.vmap(lambda p, py: _fill_rows(p, py, width), in_axes=(0, None))

    def body(carry, bi):
        inter, aa, ab = carry
        py = (bi * block + jnp.arange(block)).astype(pts_a.dtype)[:, None]
        row_ok = py < height  # rows past the grid (last partial block)
        ma = (raster_a(pa, py) & row_ok & ok_a[:, None, None]).astype(f)
        mb = (raster_b(pb, py) & row_ok & ok_b[:, None, None]).astype(f)
        inter = inter + jnp.einsum("nrw,mrw->nm", ma, mb)
        aa = aa + ma.sum((1, 2))
        ab = ab + mb.sum((1, 2))
        return (inter, aa, ab), None

    N, M = pts_a.shape[0], pts_b.shape[0]
    init = (jnp.zeros((N, M), f), jnp.zeros((N,), f), jnp.zeros((M,), f))
    (inter, aa, ab), _ = jax.lax.scan(body, init, jnp.arange(n_blocks))
    return inter / (aa[:, None] + ab[None, :] - inter + eps)


@partial(jax.jit, static_argnames=("height", "width"))
def fill_polygons(points: jnp.ndarray, valid: jnp.ndarray, height: int, width: int):
    """Batch fill: points (N, V, 2), valid (N, V) -> (N, H, W) bool masks."""
    return jax.vmap(lambda p, v: fill_polygon(p, v, height, width))(points, valid)


@partial(jax.jit, static_argnames=("height", "width"))
def fill_polygons_in_boxes(points, valid, boxes, height: int, width: int):
    """Box-cropped fill: rasterize only inside each polygon's bbox (zero
    elsewhere), cutting wasted work for small instances while keeping the
    output frame full-size. boxes (N, 4) xyxy."""
    masks = fill_polygons(points, valid, height, width)
    py = jnp.arange(height, dtype=boxes.dtype)[None, :, None]
    px = jnp.arange(width, dtype=boxes.dtype)[None, None, :]
    inbox = (
        (px >= jnp.floor(boxes[:, None, None, 0]))
        & (px <= jnp.ceil(boxes[:, None, None, 2]))
        & (py >= jnp.floor(boxes[:, None, None, 1]))
        & (py <= jnp.ceil(boxes[:, None, None, 3]))
    )
    return masks & inbox


def polygons_to_masks(contours, height: int, width: int, downsample: int = 1):
    """GT polygons (N, P, 2) (all vertices valid) -> (N, H/d, W/d) masks,
    replacing the reference's polygon2mask (data/utils.py:140) cv2 path."""
    if downsample != 1:
        contours = contours / downsample
        height, width = height // downsample, width // downsample
    valid = jnp.ones(contours.shape[:-1], bool)
    return fill_polygons(contours, valid, height, width)
