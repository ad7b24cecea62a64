import numpy as np
import jax.numpy as jnp
import pytest

from yolo_contour_regression_tpu.ops.raster import (
    collapse_invalid_vertices,
    fill_polygon,
    fill_polygons,
)


def test_fill_square():
    pts = jnp.array([[2.0, 2], [8, 2], [8, 8], [2, 8]])
    valid = jnp.ones(4, bool)
    m = np.asarray(fill_polygon(pts, valid, 12, 12))
    assert m[5, 5]
    assert not m[0, 0]
    assert not m[10, 10]
    # area ~ 36 px (6x6 interior at integer sampling)
    assert 30 <= m.sum() <= 42


def test_fill_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for _ in range(3):
        n = 24
        t = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(20, 50, n)
        pts = np.stack([64 + r * np.cos(t), 64 + r * np.sin(t)], -1).astype(np.float32)
        want = np.zeros((128, 128), np.uint8)
        cv2.fillPoly(want, [pts.astype(np.int32)], 1)
        got = np.asarray(fill_polygon(jnp.asarray(pts), jnp.ones(n, bool), 128, 128))
        inter = (got & (want > 0)).sum()
        union = (got | (want > 0)).sum()
        assert inter / union > 0.9  # only sub-pixel boundary differences


def test_invalid_vertices_collapse():
    pts = jnp.array([[0.0, 0], [100, 100], [10, 0], [10, 10], [200, 200], [0, 10]])
    valid = jnp.array([True, False, True, True, False, True])
    got = np.asarray(collapse_invalid_vertices(pts, valid))
    np.testing.assert_allclose(got[1], [0, 0])  # collapses onto previous valid
    np.testing.assert_allclose(got[4], [10, 10])
    # fill equals the 4-valid-vertex square
    m = np.asarray(fill_polygon(pts, valid, 16, 16))
    m_ref = np.asarray(
        fill_polygon(jnp.array([[0.0, 0], [10, 0], [10, 10], [0, 10]]), jnp.ones(4, bool), 16, 16)
    )
    np.testing.assert_array_equal(m, m_ref)


def test_all_invalid_gives_empty():
    pts = jnp.ones((5, 2)) * 3
    m = np.asarray(fill_polygon(pts, jnp.zeros(5, bool), 8, 8))
    assert m.sum() == 0


def test_fill_polygons_batch():
    pts = jnp.stack(
        [
            jnp.array([[1.0, 1], [6, 1], [6, 6], [1, 6]]),
            jnp.array([[0.0, 0], [3, 0], [3, 3], [0, 3]]),
        ]
    )
    valid = jnp.ones((2, 4), bool)
    m = np.asarray(fill_polygons(pts, valid, 8, 8))
    assert m.shape == (2, 8, 8)
    assert m[0].sum() > m[1].sum() > 0
