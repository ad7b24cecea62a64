"""Pallas rasterization kernel: interpret-mode parity with the jnp reference
(the compiled kernel is exercised on real TPU by the validator/bench)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_contour_regression_tpu.ops.raster import fill_polygons
from yolo_contour_regression_tpu.ops.pallas_raster import fill_polygons_pallas


@pytest.mark.parametrize("hw", [(32, 32), (48, 64)])
def test_pallas_interpret_parity(hw):
    H, W = hw
    rng = np.random.default_rng(0)
    N, V = 4, 12
    t = np.sort(rng.uniform(0, 2 * np.pi, (N, V)), axis=1)
    r = rng.uniform(3, min(H, W) * 0.4, (N, V))
    pts = np.stack([W / 2 + r * np.cos(t), H / 2 + r * np.sin(t)], -1).astype(np.float32)
    valid = rng.uniform(size=(N, V)) > 0.2
    valid[:, 0] = True
    want = np.asarray(fill_polygons(jnp.asarray(pts), jnp.asarray(valid), H, W))
    got = np.asarray(
        fill_polygons_pallas(jnp.asarray(pts), jnp.asarray(valid), H, W, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_all_invalid_empty():
    pts = jnp.ones((2, 8, 2)) * 5
    out = fill_polygons_pallas(pts, jnp.zeros((2, 8), bool), 16, 16, interpret=True)
    assert int(np.asarray(out).sum()) == 0
