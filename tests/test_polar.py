"""Golden tests for the polar-contour core: the reference had NO unit tests for
this math (SURVEY.md §4) — these pin the formulas from tal.py:1178-1301,
head.py:461-492, tal.py:1445, loss.py:109."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_contour_regression_tpu.ops import polar as P


def circle_contour(cx, cy, r, n=360):
    t = np.linspace(0, 2 * math.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], -1).astype(np.float32)


def reference_gt_rays(contour, center):
    """Independent numpy transcription of the reference angle-binning math
    (tal.py:1178-1193): per 10-deg bin take top-4 nearest-angle contour points,
    max distance among them, 3-deg min-gap cutoff -> 1e-6."""
    v = contour - center
    ang = np.degrees(np.arctan2(v[:, 1], v[:, 0]))
    ang = np.where(ang < 0, ang + 360, ang)
    dist = np.linalg.norm(v, axis=1)
    rays = np.zeros(36, np.float32)
    for t in range(36):
        diff = np.abs(ang - t * 10)
        diff = np.where(diff > 180, 360 - diff, diff)
        idx = np.argsort(diff)[:4]
        rays[t] = 1e-6 if diff[idx[0]] > 3 else max(dist[idx].max(), 1e-6)
    return rays


def test_gt_rays_circle_centered():
    c = circle_contour(50, 50, 10)
    rays = P.gt_rays_from_contour(jnp.asarray(c)[None], jnp.array([[50.0, 50.0]]))[0]
    np.testing.assert_allclose(rays, np.full(36, 10.0), rtol=1e-4)


def test_gt_rays_matches_reference_formula():
    rng = np.random.default_rng(0)
    for _ in range(3):
        # random star-shaped-ish polygon: circle with radius noise
        r = 5 + rng.uniform(0, 10)
        c = circle_contour(30, 40, r)
        c += rng.normal(0, 0.5, c.shape).astype(np.float32)
        center = np.array([30 + rng.uniform(-3, 3), 40 + rng.uniform(-3, 3)], np.float32)
        want = reference_gt_rays(c, center)
        got = P.gt_rays_from_contour(jnp.asarray(c)[None], jnp.asarray(center)[None])[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gt_rays_offcenter_anchor_invisible_rays():
    # anchor far outside a small circle: rays pointing away must be invisible
    c = circle_contour(100, 100, 5)
    anchor = jnp.array([[100.0, 130.0]])  # 30px below (y-down: angle to contour ~270deg)
    rays = np.asarray(P.gt_rays_from_contour(jnp.asarray(c)[None], anchor)[0])
    want = reference_gt_rays(c, np.array([100.0, 130.0], np.float32))
    np.testing.assert_allclose(rays, want, rtol=1e-4, atol=1e-5)
    assert (rays <= 1e-5).sum() > 10  # many bins see no contour within 3 deg


def test_gt_rays_chunked_equals_dense():
    rng = np.random.default_rng(1)
    cs = np.stack([circle_contour(20, 20, 3 + i) for i in range(10)])
    centers = np.stack([[20 + rng.uniform(-2, 2), 20 + rng.uniform(-2, 2)] for _ in range(10)]).astype(np.float32)
    dense = P.gt_rays_from_contour(jnp.asarray(cs), jnp.asarray(centers))
    chunked = P.gt_rays_from_contour(jnp.asarray(cs), jnp.asarray(centers), chunk=4)
    np.testing.assert_allclose(dense, chunked, atol=1e-6)


def test_decode_rays_golden():
    rays = jnp.full((1, 1, 36), 10.0)
    anchors = jnp.array([[100.0, 100.0]])
    pts, valid, boxes = P.decode_rays(rays, anchors)
    assert bool(valid.all())
    np.testing.assert_allclose(boxes[0, 0], [90, 90, 110, 110], atol=1e-3)
    # ray 0 points along +x, ray 9 (90 deg) along +y (down in image frame)
    np.testing.assert_allclose(pts[0, 0, 0], [110, 100], atol=1e-4)
    np.testing.assert_allclose(pts[0, 0, 9], [100, 110], atol=1e-4)


def test_decode_rays_invisible():
    rays = jnp.full((1, 1, 36), 0.5)  # below the >1 visibility threshold
    anchors = jnp.array([[10.0, 10.0]])
    _, valid, _ = P.decode_rays(rays, anchors)
    assert not bool(valid.any())


def test_polar_mask_iou():
    a = jnp.full((36,), 2.0)
    b = jnp.full((36,), 4.0)
    np.testing.assert_allclose(P.polar_mask_iou(a, b), 0.5, atol=1e-6)
    np.testing.assert_allclose(P.polar_mask_iou(a, a), 1.0, atol=1e-6)


def test_polar_centerness():
    rays = jnp.concatenate([jnp.full((18,), 1.0), jnp.full((18,), 4.0)])
    np.testing.assert_allclose(P.polar_centerness(rays), 0.5, atol=1e-6)


def test_mask_iou_loss_zero_at_perfect():
    pred = jnp.full((5, 36), 3.0)
    w = jnp.ones(5)
    loss = P.mask_iou_loss(pred, pred, w, norm=5.0)
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)
    worse = P.mask_iou_loss(pred * 2, pred, w, norm=5.0)
    np.testing.assert_allclose(worse, math.log(2.0), atol=1e-5)


def test_make_anchors_layout():
    pts, st = P.make_anchors([(2, 3), (1, 1)], [8, 16])
    assert pts.shape == (7, 2)
    np.testing.assert_allclose(pts[0], [0.5, 0.5])
    np.testing.assert_allclose(pts[1], [1.5, 0.5])  # x-fastest (row-major)
    np.testing.assert_allclose(pts[3], [0.5, 1.5])
    np.testing.assert_allclose(st[:6], np.full((6, 1), 8.0))
    np.testing.assert_allclose(st[6], [16.0])


def test_resample_contour_square():
    sq = jnp.array([[0.0, 0], [10, 0], [10, 10], [0, 10]])
    pts = jnp.zeros((8, 2)).at[:4].set(sq)
    valid = jnp.arange(8) < 4
    out = np.asarray(P.resample_contour(pts, valid, num_points=9))
    # 9 samples over the closed 4-gon: fractional positions k*4/8 for k=0..8,
    # i.e. corners at even k, edge midpoints at odd k, closing back at p0.
    np.testing.assert_allclose(out[0], [0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1], [5, 0], atol=1e-5)
    np.testing.assert_allclose(out[2], [10, 0], atol=1e-5)
    np.testing.assert_allclose(out[4], [10, 10], atol=1e-5)
    np.testing.assert_allclose(out[8], [0, 0], atol=1e-5)


def test_lazy_decode_matches_full():
    """decode_polar_lazy + finalize_polar_extras must reproduce decode_polar
    exactly (boxes, scores, and the 108-column contour layout) — the lazy
    path only defers the points materialization past NMS."""
    from yolo_contour_regression_tpu.nn.modules.head import (
        decode_polar,
        decode_polar_lazy,
        finalize_polar_extras,
    )

    rng = np.random.default_rng(0)
    nc, strides = 3, (8, 16, 32)
    outs = [
        jnp.asarray(rng.normal(2.0, 3.0, (2, s, s, 36 + nc)).astype(np.float32))
        for s in (8, 4, 2)
    ]
    full = np.asarray(decode_polar(outs, strides, nc))      # (2, 4+nc+108, A)
    lazy = decode_polar_lazy(outs, strides, nc)             # (2, 4+nc+38, A)
    np.testing.assert_allclose(np.asarray(lazy[:, : 4 + nc]), full[:, : 4 + nc],
                               rtol=1e-6, atol=1e-6)
    ex = jnp.transpose(lazy[:, 4 + nc :], (0, 2, 1))        # (2, A, 38)
    ex108 = np.asarray(finalize_polar_extras(ex))           # (2, A, 108)
    np.testing.assert_allclose(
        ex108, np.transpose(full[:, 4 + nc :], (0, 2, 1)), rtol=1e-6, atol=1e-6
    )
