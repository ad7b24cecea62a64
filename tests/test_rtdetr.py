"""RT-DETR family: model build, eval decode, Hungarian loss, grads."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CFG = Path(__file__).parent.parent / "yolo_contour_regression_tpu/cfg/models"


@pytest.fixture(scope="module")
def rtdetr():
    from yolo_contour_regression_tpu.nn.tasks import build_model

    m = build_model(CFG / "rtdetr-l.yaml")
    v = m.init(imgsz=64)
    return m, v


def test_rtdetr_build_and_eval(rtdetr):
    m, v = rtdetr
    assert m.task == "rtdetr"
    out = m.predict(v, jnp.zeros((1, 64, 64, 3)))
    assert out.shape[0] == 1 and out.shape[2] == 4 + 80
    o = np.asarray(out)
    assert np.isfinite(o).all()
    # boxes normalized cxcywh, scores sigmoid
    assert (o[..., :4] >= 0).all() and (o[..., :4] <= 1).all()
    assert (o[..., 4:] >= 0).all() and (o[..., 4:] <= 1).all()


def test_hungarian_assign_unique():
    from yolo_contour_regression_tpu.models.utils.loss import hungarian_assign

    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.uniform(0, 1, (2, 8, 3)).astype(np.float32))
    n_valid = jnp.asarray([3, 1])
    a = np.asarray(hungarian_assign(cost, n_valid))
    assert a.shape == (2, 3)
    # image 0: 3 unique assigned queries
    assert len(set(a[0])) == 3 and (a[0] >= 0).all()
    # image 1: only first gt assigned
    assert a[1, 0] >= 0 and (a[1, 1:] == -1).all()
    # matches scipy directly
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(np.asarray(cost)[0])
    want = np.full(3, -1)
    want[cols] = rows
    np.testing.assert_array_equal(a[0], want)


def test_rtdetr_loss_and_grads(rtdetr):
    m, v = rtdetr
    from yolo_contour_regression_tpu.models.utils.loss import rtdetr_loss

    batch = {
        "bboxes": jnp.zeros((1, 4, 4)).at[0, 0].set(jnp.asarray([0.5, 0.5, 0.3, 0.3])),
        "cls": jnp.zeros((1, 4), jnp.int32),
        "mask_gt": jnp.zeros((1, 4), bool).at[0, 0].set(True),
    }
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    )

    def loss_fn(params):
        outs, _ = m.raw_forward({**v, "params": params}, x, train=True)
        total, items = rtdetr_loss(outs, batch, m.nc)
        return total

    total, grads = jax.value_and_grad(loss_fn)(v["params"])
    assert np.isfinite(float(total))
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
