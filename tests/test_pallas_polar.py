"""Pallas GT-ray kernel: interpret-mode parity with the jnp reference
(compiled-kernel parity is exercised on real TPU by the train step)."""
import math

import numpy as np
import jax.numpy as jnp

from yolo_contour_regression_tpu.ops.polar import gt_rays_from_contour
from yolo_contour_regression_tpu.ops.pallas_polar import _atan2, gt_rays_pallas


def test_poly_atan2_accuracy():
    rng = np.random.default_rng(0)
    y = rng.normal(0, 10, 5000).astype(np.float32)
    x = rng.normal(0, 10, 5000).astype(np.float32)
    got = np.asarray(_atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    assert np.abs(got - want).max() < 2e-5  # ~0.001 deg


def test_gt_rays_pallas_interpret_parity():
    rng = np.random.default_rng(1)
    P = 24
    t = np.sort(rng.uniform(0, 2 * math.pi, (P, 360)), axis=1)
    r = 5 + rng.uniform(0, 30, (P, 360))
    cont = np.stack([100 + r * np.cos(t), 100 + r * np.sin(t)], -1).astype(np.float32)
    ctr = (100 + rng.uniform(-20, 20, (P, 2))).astype(np.float32)
    got = np.asarray(gt_rays_pallas(jnp.asarray(cont), jnp.asarray(ctr), interpret=True))
    want = np.asarray(gt_rays_from_contour(jnp.asarray(cont), jnp.asarray(ctr)))
    rel = np.abs(got - want) / np.maximum(want, 1e-3)
    assert (rel < 0.01).all()


def test_gt_rays_pallas_padding():
    # P not a multiple of PAIRS_PER_PROG: padded rows must not corrupt output
    rng = np.random.default_rng(2)
    P = 5
    t = np.sort(rng.uniform(0, 2 * math.pi, (P, 360)), axis=1)
    cont = np.stack([50 + 10 * np.cos(t), 50 + 10 * np.sin(t)], -1).astype(np.float32)
    ctr = np.full((P, 2), 50.0, np.float32)
    got = np.asarray(gt_rays_pallas(jnp.asarray(cont), jnp.asarray(ctr), interpret=True))
    want = np.asarray(gt_rays_from_contour(jnp.asarray(cont), jnp.asarray(ctr)))
    assert got.shape == (P, 36)
    # random angular spacing can legitimately leave >3-deg gaps (invisible
    # rays), so parity with the reference is the correct check
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_gt_rays_pallas2_interpret_parity():
    """v2 (batched-sweep) kernel matches the jnp reference and v1 exactly."""
    import math

    import jax.numpy as jnp

    from yolo_contour_regression_tpu.ops.pallas_polar import (
        gt_rays_pallas,
        gt_rays_pallas2,
    )
    from yolo_contour_regression_tpu.ops.polar import gt_rays_from_contour

    rng = np.random.default_rng(3)
    P = 21  # non-multiple of the block size: exercises padding
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    a = rng.uniform(10, 60, (P, 1))
    b = rng.uniform(10, 60, (P, 1))
    cx = rng.uniform(80, 200, (P, 1))
    cy = rng.uniform(80, 200, (P, 1))
    contours = np.stack(
        [cx + a * np.cos(t)[None], cy + b * np.sin(t)[None]], -1
    ).astype(np.float32)
    centers = rng.uniform(0, 256, (P, 2)).astype(np.float32)

    ref = np.asarray(gt_rays_from_contour(jnp.asarray(contours), jnp.asarray(centers)))
    v1 = np.asarray(gt_rays_pallas(jnp.asarray(contours), jnp.asarray(centers), interpret=True))
    v2 = np.asarray(gt_rays_pallas2(jnp.asarray(contours), jnp.asarray(centers), interpret=True))
    np.testing.assert_allclose(v2, v1, atol=1e-5)
    np.testing.assert_allclose(v2, ref, atol=1e-2, rtol=1e-3)  # poly-atan2 tol

def test_gt_rays_pallas3_interpret_parity():
    """v3 row-shared kernel == dense reference on all-valid pairs."""
    import numpy as np
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.ops.pallas_polar import gt_rays_pallas3
    from yolo_contour_regression_tpu.ops.polar import gt_rays_from_contour

    rng = np.random.RandomState(0)
    R, K = 4, 16
    t = np.linspace(0, 2 * np.pi, 360, endpoint=False)
    rad = 20 + 10 * rng.rand(R, 1)
    cx = 64 + 20 * rng.rand(R, 1)
    cy = 64 + 20 * rng.rand(R, 1)
    contours = np.stack(
        [cx + rad * np.cos(t), cy + rad * np.sin(t)], -1
    ).astype(np.float32)  # (R, 360, 2)
    centers = (contours.mean(1, keepdims=True)
               + rng.uniform(-8, 8, (R, K, 2))).astype(np.float32)
    valid = np.ones((R, K), bool)

    got = gt_rays_pallas3(
        jnp.asarray(contours), jnp.asarray(centers), jnp.asarray(valid),
        interpret=True,
    )
    pairs = np.broadcast_to(contours[:, None], (R, K, 360, 2)).reshape(-1, 360, 2)
    want = gt_rays_from_contour(
        jnp.asarray(pairs), jnp.asarray(centers.reshape(-1, 2))
    ).reshape(R, K, 36)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-3)


def test_gt_rays_pallas3_block_skip():
    """Fully-invalid 8-pair blocks emit the RAY_EPS sentinel; valid-prefix
    pairs keep exact values (the n_max=48 cliff fix)."""
    import numpy as np
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.ops.pallas_polar import gt_rays_pallas3
    from yolo_contour_regression_tpu.ops.polar import RAY_EPS, gt_rays_from_contour

    rng = np.random.RandomState(1)
    R, K = 2, 24  # 3 blocks per row
    t = np.linspace(0, 2 * np.pi, 360, endpoint=False)
    contours = np.stack(
        [48 + 16 * np.cos(t), 48 + 16 * np.sin(t)], -1
    ).astype(np.float32)[None].repeat(R, 0)
    centers = (48 + rng.uniform(-6, 6, (R, K, 2))).astype(np.float32)
    valid = np.zeros((R, K), bool)
    valid[0, :5] = True   # block 0 active (mixed), blocks 1-2 skipped
    # row 1: all invalid -> every block skipped

    got = np.asarray(gt_rays_pallas3(
        jnp.asarray(contours), jnp.asarray(centers), jnp.asarray(valid),
        interpret=True,
    ))
    # skipped blocks: sentinel everywhere
    np.testing.assert_allclose(got[0, 8:], RAY_EPS)
    np.testing.assert_allclose(got[1], RAY_EPS)
    # active block: parity for the valid prefix
    want = np.asarray(gt_rays_from_contour(
        jnp.asarray(contours[0][None].repeat(5, 0)), jnp.asarray(centers[0, :5])
    ))
    np.testing.assert_allclose(got[0, :5], want, rtol=2e-4, atol=2e-3)


def test_gt_rays_rows_fast_pads_nonmultiple_k():
    import numpy as np
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.ops.pallas_polar import gt_rays_rows_fast
    from yolo_contour_regression_tpu.ops.polar import gt_rays_from_contour

    rng = np.random.RandomState(2)
    R, K = 3, 13
    t = np.linspace(0, 2 * np.pi, 360, endpoint=False)
    contours = np.stack(
        [32 + 10 * np.cos(t), 32 + 10 * np.sin(t)], -1
    ).astype(np.float32)[None].repeat(R, 0)
    centers = (32 + rng.uniform(-4, 4, (R, K, 2))).astype(np.float32)
    valid = np.ones((R, K), bool)
    got = gt_rays_rows_fast(
        jnp.asarray(contours), jnp.asarray(centers), jnp.asarray(valid),
        interpret=True,
    )
    assert got.shape == (R, K, 36)
    pairs = np.broadcast_to(contours[:, None], (R, K, 360, 2)).reshape(-1, 360, 2)
    want = gt_rays_from_contour(
        jnp.asarray(pairs), jnp.asarray(centers.reshape(-1, 2))
    ).reshape(R, K, 36)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-3)
