"""Model construction parity tests (graph builder + heads)."""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_contour_regression_tpu.nn.tasks import build_model, parse_model, yaml_model_load

CFG = Path(__file__).parent.parent / "yolo_contour_regression_tpu/cfg/models"


def test_parse_model_scaling():
    cfg = yaml_model_load(CFG / "yolov8n-seg.yaml")
    assert cfg["scale"] == "n"
    specs, save, head = parse_model(cfg)
    assert head.name == "Segment"
    assert head.kwargs["nm"] == 36
    # n-scale width 0.25: first RepConv 64 -> 16
    assert specs[0].kwargs["c2"] == 16
    # savelist covers the PAN skip connections
    assert set(save) >= {4, 6, 9, 12, 15, 18, 21}


def test_detect_param_count_matches_reference():
    # reference YOLOv8n summary: 3,157,184 gradients (yolov8.yaml header)
    m = build_model(CFG / "yolov8.yaml")
    m.init(imgsz=64)
    assert m.num_params == 3157184


def test_seg_model_forward_and_decode():
    m = build_model(CFG / "yolov8-seg.yaml")
    v = m.init(imgsz=64)
    x = jnp.zeros((1, 64, 64, 3))
    outs = m.raw_forward(v, x)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 46), (1, 4, 4, 46), (1, 2, 2, 46),
    ]  # 36 rays + 10 classes per level
    pred = m.predict(v, x)
    assert pred.shape == (1, 4 + 10 + 108, 84)
    assert bool(jnp.isfinite(pred).all())


def test_strides_calibration():
    m = build_model(CFG / "yolov8-seg.yaml")
    assert m.strides == (8, 16, 32)


def test_bias_init_applied():
    import math

    m = build_model(CFG / "yolov8-seg.yaml")
    v = m.init(imgsz=64)
    head = v["params"][f"layer{m.head_index}"]
    # polar ray branch bias = 1.0
    np.testing.assert_allclose(np.asarray(head["cv2_0_2"]["bias"]), 1.0)
    # cls bias = log(5/nc/(640/s)^2)
    np.testing.assert_allclose(
        np.asarray(head["cv3_0_2"]["bias"]),
        math.log(5 / 10 / (640 / 8) ** 2),
        rtol=1e-5,
    )


def test_train_mode_updates_batch_stats():
    m = build_model(CFG / "yolov8-seg.yaml")
    v = m.init(imgsz=64)
    x = jnp.ones((2, 64, 64, 3))
    outs, new_stats = m.raw_forward(v, x, train=True)
    old = np.asarray(v["batch_stats"]["layer0"]["bn1"]["mean"])
    new = np.asarray(new_stats["layer0"]["bn1"]["mean"])
    assert not np.allclose(old, new)


def test_nc_override():
    m = build_model(CFG / "yolov8-seg.yaml", nc=3)
    v = m.init(imgsz=64)
    pred = m.predict(v, jnp.zeros((1, 64, 64, 3)))
    assert pred.shape[1] == 4 + 3 + 108
