"""Native ONNX exporter: wire-format, numpy-executor, and OpenCV-DNN parity.

The exported graph must match ``model.predict`` (decode in-graph). Parity is
checked two independent ways:
  1. the builder's numpy reference executor (onnx/builder.py) — validates the
     emitted node semantics;
  2. OpenCV-DNN (cv2.dnn.readNetFromONNX) — a real third-party consumer of the
     serialized bytes, the same runtime family the reference's C++ example
     uses (reference examples/YOLOv8-CPP-Inference uses cv::dnn with ONNX).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _export_and_check(yaml_name, task_kwargs, imgsz, tmp_path, n_outputs=1,
                      tol=2e-3):
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.fuse import fuse_variables
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.onnx.export import export_onnx

    model = build_model(yaml_name, **task_kwargs)
    variables = model.init(imgsz=imgsz)
    fvars, fmodel = fuse_variables(model, variables)

    rng = np.random.default_rng(0)
    x = rng.random((1, imgsz, imgsz, 3), np.float32)
    ref = fmodel.predict(fvars, jnp.asarray(x))
    refs = [np.asarray(r) for r in (ref if isinstance(ref, tuple) else (ref,))]

    path = str(tmp_path / "m.onnx")
    g, outs = export_onnx(fmodel, fvars, path, imgsz=imgsz)
    assert len(outs) == n_outputs

    xc = x.transpose(0, 3, 1, 2).copy()
    got = g.run({"images": xc})
    for (name, shape), ref_i in zip(outs, refs):
        if ref_i.ndim == 4:  # NHWC proto -> NCHW
            ref_i = ref_i.transpose(0, 3, 1, 2)
        assert list(got[name].shape) == shape == list(ref_i.shape)
        np.testing.assert_allclose(got[name], ref_i, atol=tol, rtol=1e-2)

    net = cv2.dnn.readNetFromONNX(path)
    net.setInput(xc, "images")
    cv_outs = net.forward([name for name, _ in outs])
    for cv_o, (name, _) in zip(cv_outs, outs):
        np.testing.assert_allclose(cv_o, got[name], atol=tol, rtol=1e-2)
    return g, outs, refs


def test_onnx_polar_segment_parity(tmp_path):
    _export_and_check("yolov8n-seg.yaml", {"nc": 10}, 96, tmp_path)


def test_onnx_detect_parity(tmp_path):
    _export_and_check("yolov8n.yaml", {"task": "detect", "nc": 2}, 64, tmp_path)


def test_onnx_pose_parity(tmp_path):
    _export_and_check("yolov8n-pose.yaml", {"task": "pose"}, 64, tmp_path)


def test_onnx_segment_ori_parity(tmp_path):
    _export_and_check(
        "yolov8n-segori.yaml", {"task": "segment_ori", "nc": 3}, 64, tmp_path,
        n_outputs=2,
    )


def test_onnx_classify_parity(tmp_path):
    _export_and_check("yolov8n-cls.yaml", {"task": "classify", "nc": 2}, 64, tmp_path)


def test_exporter_facade_onnx(tmp_path):
    """YOLO.export(format='onnx') writes the artifact + metadata, and
    AutoBackend loads it through cv2.dnn with the NHWC forward contract."""
    from yolo_contour_regression_tpu.engine.model import YOLO
    from yolo_contour_regression_tpu.nn.autobackend import AutoBackend

    m = YOLO("yolov8n-seg.yaml")
    m.model.init(imgsz=64)
    path = m.export(format="onnx", imgsz=64, project=str(tmp_path))
    assert path.endswith(".onnx")
    backend = AutoBackend(path)
    x = np.random.default_rng(1).random((1, 64, 64, 3), np.float32)
    out = backend(x)
    a = sum((64 // s) ** 2 for s in m.model.strides)
    assert out.shape == (1, 4 + m.model.nc + 108, a)


@pytest.mark.heavy
def test_onnx_rtdetr_parity(tmp_path):
    """RT-DETR native export: HGNetV2 + AIFI + deformable decoder emitted in
    opset-12 primitives; validated against model.predict through the numpy
    executor (TopK/GatherElements are beyond OpenCV-DNN, so no cv2 leg —
    consumers are onnxruntime or this executor)."""
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.fuse import fuse_variables
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.onnx.export import export_onnx

    imgsz = 64
    model = build_model("rtdetr-l.yaml", task="rtdetr", nc=3)
    variables = model.init(imgsz=imgsz)
    fvars, fmodel = fuse_variables(model, variables)

    rng = np.random.default_rng(0)
    x = rng.random((1, imgsz, imgsz, 3), np.float32)
    ref = np.asarray(fmodel.predict(fvars, jnp.asarray(x)))  # (1, nq, 4+nc)

    path = str(tmp_path / "rtdetr.onnx")
    g, outs = export_onnx(fmodel, fvars, path, imgsz=imgsz)
    assert len(outs) == 1 and outs[0][1] == list(ref.shape)
    got = g.run({"images": x.transpose(0, 3, 1, 2).copy()})[outs[0][0]]
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-2)


def test_onnx_yolov6_parity(tmp_path):
    """v6's ConvTranspose upsampling neck through the native exporter."""
    _export_and_check("yolov6n.yaml", {"task": "detect", "nc": 2}, 64, tmp_path)
