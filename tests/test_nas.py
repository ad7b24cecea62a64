"""Native YOLO-NAS family: QARepVGG/NASCSP graph, facade, fuse parity, ONNX.

The reference's NAS is a super-gradients checkpoint wrapper with no in-repo
architecture (reference models/nas/model.py:34); this build reconstructs the
topology natively, so it must behave like any first-class family."""
import numpy as np
import pytest


@pytest.mark.heavy
def test_nas_build_and_predict():
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.tasks import build_model

    m = build_model("yolo_nas_s.yaml", task="detect", nc=4)
    assert list(m.strides) == [8, 16, 32]
    v = m.init(imgsz=64)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3), np.float32))
    pred = m.predict(v, x)
    a = sum((64 // s) ** 2 for s in m.strides)
    assert pred.shape == (1, 4 + 4, a)
    assert bool(jnp.isfinite(pred).all())


@pytest.mark.heavy
def test_nas_scale_ladder():
    """yolo_nas_{s,m,l} names resolve to the base yaml with growing width."""
    from yolo_contour_regression_tpu.nn.tasks import build_model

    def nparams(model):
        import jax

        v = model.init(imgsz=64)
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))

    s = nparams(build_model("yolo_nas_s.yaml", task="detect", nc=2))
    m = nparams(build_model("yolo_nas_m.yaml", task="detect", nc=2))
    assert m > 1.3 * s


def test_nas_facade():
    from yolo_contour_regression_tpu import NAS

    model = NAS("yolo_nas_s")
    assert model.task == "detect"
    with pytest.raises(NotImplementedError, match="convert"):
        NAS("yolo_nas_s.pt")


@pytest.mark.heavy
def test_nas_fuse_parity():
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.fuse import fuse_variables
    from yolo_contour_regression_tpu.nn.tasks import build_model

    m = build_model("yolo_nas_s.yaml", task="detect", nc=2)
    v = m.init(imgsz=64)
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3), np.float32))
    ref = m.predict(v, x)
    fvars, fm = fuse_variables(m, v)
    got = fm.predict(fvars, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-2)


@pytest.mark.heavy
def test_nas_onnx_parity(tmp_path):
    pytest.importorskip("cv2")
    from tests.test_onnx_export import _export_and_check

    _export_and_check("yolo_nas_s.yaml", {"task": "detect", "nc": 2}, 64, tmp_path)


@pytest.mark.heavy
def test_nas_train_grads():
    """One SGD step on the NAS detect loss decreases it (trainability)."""
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.loss import detection_loss
    from types import SimpleNamespace

    HYP = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    m = build_model("yolo_nas_s.yaml", task="detect", nc=2)
    v = m.init(imgsz=64)
    x = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 3), np.float32))
    batch = {
        "cls": jnp.zeros((1, 4), jnp.int32),
        "bboxes": jnp.zeros((1, 4, 4)).at[0, 0].set(jnp.asarray([0.5, 0.5, 0.4, 0.4])),
        "mask_gt": jnp.zeros((1, 4), bool).at[0, 0].set(True),
    }

    def loss_fn(p):
        feats, _ = m.raw_forward({**v, "params": p}, x, train=True)
        return detection_loss(feats, batch, m.strides, m.nc, HYP).total

    l0, g = jax.value_and_grad(loss_fn)(v["params"])
    assert bool(jnp.isfinite(l0))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    gnorm = sum(float((x.astype(jnp.float32) ** 2).sum()) for x in leaves) ** 0.5
    assert gnorm > 1e-3  # gradient actually flows through the RepVGG graph
    # tiny normalized descent step must reduce the loss (first-order check;
    # a fixed lr overshoots on the untrained BN-heavy RepVGG graph)
    p1 = jax.tree_util.tree_map(lambda a, b: a - (1e-2 / gnorm) * b, v["params"], g)
    l1 = loss_fn(p1)
    assert float(l1) < float(l0)
