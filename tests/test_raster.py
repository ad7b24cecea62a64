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


def test_host_rasterizer_matches_device():
    """contours_to_masks_host (the lazy Results.masks backend) matches
    fill_polygons up to sub-pixel boundary differences, including invalid
    vertices and empty instances."""
    from yolo_contour_regression_tpu.engine.results import contours_to_masks_host

    rng = np.random.default_rng(3)
    H = W = 96
    t = np.linspace(0, 2 * np.pi, 36, endpoint=False)
    pts, valid = [], []
    for i in range(4):
        # smooth star contours (real polar outputs are locally smooth)
        r = 28 + 10 * np.sin(3 * t + i) + rng.uniform(-2, 2, 36)
        pts.append(np.stack([48 + r * np.cos(t), 48 + r * np.sin(t)], -1))
        v = np.ones(36, bool)
        if i == 1:
            v[::3] = False           # invalid rays collapse/drop
        if i == 3:
            v[:] = False             # fully invalid -> empty mask
        valid.append(v)
    pts = np.asarray(pts, np.float32)
    valid = np.asarray(valid)
    want = np.asarray(fill_polygons(jnp.asarray(pts), jnp.asarray(valid), H, W))
    got = contours_to_masks_host(pts, valid, H, W)
    assert got.shape == want.shape == (4, H, W)
    assert not got[3].any() and not want[3].any()
    for i in range(3):
        inter = (got[i] & want[i]).sum()
        union = (got[i] | want[i]).sum()
        assert inter / union > 0.9, i  # sub-pixel boundary differences only


def test_results_lazy_masks():
    from yolo_contour_regression_tpu.engine.results import Results

    t = np.linspace(0, 2 * np.pi, 36, endpoint=False)
    pts = np.stack([16 + 8 * np.cos(t), 16 + 8 * np.sin(t)], -1)[None].astype(np.float32)
    valid = np.ones((1, 36), bool)
    img = np.zeros((32, 32, 3), np.uint8)
    r = Results(img, "x", {0: "a"}, boxes=np.array([[8, 8, 24, 24, 0.9, 0]]),
                contours=(pts, valid), lazy_masks=True)
    assert r._masks is None                      # nothing materialized yet
    assert "masks" in r.keys and r._masks is None  # keys must not force it
    sliced = r[0]
    assert sliced._masks is None                 # slicing must not force it
    m = r.masks.data                             # first read rasterizes
    assert m.shape == (1, 32, 32) and m[0, 16, 16] and not m[0, 1, 1]
    assert sliced.masks.data.shape == (1, 32, 32)  # lazy flag propagated
