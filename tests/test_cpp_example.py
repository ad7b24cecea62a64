"""C++ deploy example parity: builds examples/polar-seg-cpp and checks its
NMS + rasterization against the Python ops on the same prediction dump."""
import math
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent
CPP_DIR = ROOT / "examples/polar-seg-cpp"


@pytest.fixture(scope="module")
def demo_bin(tmp_path_factory):
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no g++ available")
    out = tmp_path_factory.mktemp("cppbuild") / "polar_seg_demo"
    subprocess.run(
        [gxx, "-O2", "-std=c++17", "-o", str(out),
         str(CPP_DIR / "main.cpp"), str(CPP_DIR / "polar_postprocess.cpp")],
        check=True,
    )
    return out


def synthetic_pred(nc=3, imgsz=96, seed=0):
    """A few synthetic circular instances + noise anchors, polar layout."""
    rng = np.random.default_rng(seed)
    A = 64
    pred = np.zeros((4 + nc + 108, A), np.float32)
    angles = np.arange(0, 360, 10) * math.pi / 180
    for a in range(A):
        cx, cy = rng.uniform(20, imgsz - 20, 2)
        r = rng.uniform(5, 15)
        sx = cx + r * np.cos(angles)
        sy = cy + r * np.sin(angles)
        pred[0, a], pred[1, a] = sx.min(), sy.min()
        pred[2, a], pred[3, a] = sx.max(), sy.max()
        c = rng.integers(0, nc)
        pred[4 + c, a] = rng.uniform(0.05, 0.95)
        pred[4 + nc : 4 + nc + 36, a] = sx
        pred[4 + nc + 36 : 4 + nc + 72, a] = sy
        pred[4 + nc + 72 :, a] = (rng.uniform(size=36) > 0.2).astype(np.float32)
    return pred


def test_cpp_matches_python(demo_bin, tmp_path):
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.engine.exporter import dump_prediction
    from yolo_contour_regression_tpu.ops.nms import non_max_suppression
    from yolo_contour_regression_tpu.ops.raster import fill_polygons

    nc, imgsz = 3, 96
    pred = synthetic_pred(nc, imgsz)
    dump = tmp_path / "pred.bin"
    dump_prediction(pred, nc, imgsz, imgsz, str(dump), conf=0.25, iou=0.7)

    cpp = subprocess.run(
        [str(demo_bin), str(dump)], capture_output=True, text=True, check=True
    )
    cpp_rows = [
        [float(v) for v in line.split()] for line in cpp.stdout.strip().splitlines()
    ]

    out = non_max_suppression(
        jnp.asarray(pred)[None], nc=nc, conf_thres=0.25, iou_thres=0.7,
        pre_nms=64, max_det=64,
    )
    valid = np.asarray(out["valid"][0])
    py_boxes = np.asarray(out["boxes"][0])[valid]
    py_scores = np.asarray(out["scores"][0])[valid]
    py_cls = np.asarray(out["classes"][0])[valid]
    ex = np.asarray(out["extras"][0])[valid]

    assert len(cpp_rows) == valid.sum(), (
        f"C++ kept {len(cpp_rows)}, python kept {int(valid.sum())}"
    )
    cpp_rows.sort(key=lambda r: -r[4])
    order = np.argsort(-py_scores)
    for row, j in zip(cpp_rows, order):
        np.testing.assert_allclose(row[:4], py_boxes[j], atol=1e-3)
        assert abs(row[4] - py_scores[j]) < 1e-5
        assert int(row[5]) == int(py_cls[j])
        # mask area parity vs python rasterizer
        pts = np.stack([ex[j, :36], ex[j, 36:72]], -1)
        vmask = ex[j, 72:] > 0.5
        py_mask = np.asarray(
            fill_polygons(jnp.asarray(pts)[None], jnp.asarray(vmask)[None], imgsz, imgsz)
        )[0]
        assert abs(int(row[6]) - int(py_mask.sum())) <= py_mask.sum() * 0.02 + 4


@pytest.fixture(scope="module")
def onnx_demo_bin(tmp_path_factory):
    gxx = shutil.which("g++")
    if gxx is None or not Path("/usr/include/opencv4").exists():
        pytest.skip("g++/OpenCV headers unavailable")
    out = tmp_path_factory.mktemp("cppbuild2") / "polar_onnx_demo"
    subprocess.run(
        [gxx, "-O2", "-std=c++17", "-I/usr/include/opencv4",
         "-o", str(out),
         str(CPP_DIR / "onnx_infer.cpp"), str(CPP_DIR / "polar_postprocess.cpp"),
         "-lopencv_core", "-lopencv_dnn", "-lopencv_imgcodecs", "-lopencv_imgproc"],
        check=True,
    )
    return out


def test_cpp_onnx_consumer(onnx_demo_bin, tmp_path):
    """Native ONNX export -> OpenCV-DNN C++ forward -> C++ polar postprocess
    matches the python AutoBackend + python NMS on the same image."""
    import cv2
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.autobackend import AutoBackend
    from yolo_contour_regression_tpu.engine.model import YOLO
    from yolo_contour_regression_tpu.ops.nms import non_max_suppression

    imgsz = 64
    m = YOLO("yolov8n-seg.yaml")
    m.model.init(imgsz=imgsz)
    path = m.export(format="onnx", imgsz=imgsz, project=str(tmp_path))

    img = np.full((imgsz, imgsz, 3), 40, np.uint8)
    cv2.circle(img, (32, 32), 12, (180, 180, 180), -1)
    img_path = tmp_path / "im.png"
    cv2.imwrite(str(img_path), img)

    cpp = subprocess.run(
        [str(onnx_demo_bin), path, str(img_path), str(imgsz), "0.001", "0.7", "32"],
        capture_output=True, text=True, check=True,
    )
    cpp_rows = [
        [float(v) for v in line.split()] for line in cpp.stdout.strip().splitlines()
    ]

    # python reference: AutoBackend forward (same cv2.dnn engine) + python NMS
    backend = AutoBackend(path)
    x = img[None, ..., ::-1].astype(np.float32) / 255.0  # BGR->RGB NHWC
    pred = backend(x)
    out = non_max_suppression(
        jnp.asarray(pred), nc=m.model.nc, conf_thres=0.001, iou_thres=0.7,
        pre_nms=64, max_det=32,
    )
    valid = np.asarray(out["valid"][0])
    assert len(cpp_rows) == int(valid.sum())
    if cpp_rows:
        py_boxes = np.asarray(out["boxes"][0])[valid]
        py_scores = np.asarray(out["scores"][0])[valid]
        cpp_rows.sort(key=lambda r: -r[4])
        order = np.argsort(-py_scores)
        for row, j in zip(cpp_rows, order):
            np.testing.assert_allclose(row[:4], py_boxes[j], atol=5e-2, rtol=1e-3)
            assert abs(row[4] - py_scores[j]) < 1e-4
