"""Structural reparameterization equivalence: fused deploy model must match
the training-form model's eval outputs (reference RepConv/get_equivalent_
kernel_bias conv.py:182 + fuse_conv_and_bn torch_utils.py:123 semantics)."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from yolo_contour_regression_tpu.nn.fuse import fuse_variables
from yolo_contour_regression_tpu.nn.tasks import build_model

CFG = Path(__file__).parent.parent / "yolo_contour_regression_tpu/cfg/models"


def _randomize_stats(variables, seed=0):
    """Make BN stats non-trivial so the test is meaningful."""
    rng = np.random.default_rng(seed)

    def perturb(path, x):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if name == "mean":
            return x + jnp.asarray(rng.normal(0, 0.5, x.shape), x.dtype)
        if name == "var":
            return x * jnp.asarray(rng.uniform(0.5, 2.0, x.shape), x.dtype)
        return x

    return {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_map_with_path(
            perturb, variables["batch_stats"]
        ),
    }


def test_fuse_equivalence_polar_seg():
    m = build_model(CFG / "yolov8-seg.yaml")  # RepConv/RepBlock/Conv2 heavy
    v = _randomize_stats(m.init(imgsz=64))
    x = jnp.asarray(np.random.default_rng(1).normal(0.5, 0.2, (2, 64, 64, 3)).astype(np.float32))
    want = m.predict(v, x)
    fused_v, fm = fuse_variables(m, v)
    assert "batch_stats" not in fused_v
    got = fm.predict(fused_v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)


def test_fuse_equivalence_c2f_detect():
    m = build_model(CFG / "yolov8.yaml")
    v = _randomize_stats(m.init(imgsz=64), seed=2)
    x = jnp.asarray(np.random.default_rng(3).normal(0.5, 0.2, (1, 64, 64, 3)).astype(np.float32))
    want = m.predict(v, x)
    fused_v, fm = fuse_variables(m, v)
    got = fm.predict(fused_v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)


def test_fused_param_count_smaller():
    m = build_model(CFG / "yolov8-seg.yaml")
    v = m.init(imgsz=64)
    fused_v, _ = fuse_variables(m, v)
    n_orig = sum(int(p.size) for p in jax.tree_util.tree_leaves(v["params"]))
    n_fused = sum(int(p.size) for p in jax.tree_util.tree_leaves(fused_v["params"]))
    assert n_fused < n_orig  # 1x1 branches and BN params folded away


def test_fold_input_scale_equivalence():
    """Folding the /255 normalize into the stem conv (conv is linear in an
    input scale) gives the same predictions on the raw-cast image as the
    fused model on the normalized image."""
    from yolo_contour_regression_tpu.nn.fuse import fold_input_scale

    m = build_model(CFG / "yolov8-seg.yaml")
    v = _randomize_stats(m.init(imgsz=64), seed=4)
    raw = np.random.default_rng(5).integers(0, 255, (1, 64, 64, 3))
    fused_v, fm = fuse_variables(m, v)
    want = fm.predict(fused_v, jnp.asarray(raw.astype(np.float32) / 255.0))
    folded_v = fold_input_scale(fused_v)
    got = fm.predict(folded_v, jnp.asarray(raw.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)


def test_fold_input_scale_rejects_unfused():
    import pytest

    from yolo_contour_regression_tpu.nn.fuse import fold_input_scale

    m = build_model(CFG / "yolov8-seg.yaml")
    v = m.init(imgsz=64)
    with pytest.raises(ValueError):
        fold_input_scale(v)
