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


@pytest.mark.heavy
def test_extended_zoo_builds():
    """v6 ConvTranspose neck + 4-level P2/P6 variants (reference
    cfg/models/{v6/yolov6.yaml, v8/yolov8-p2.yaml, v8/yolov8-p6.yaml})."""
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.loss import detection_loss
    from types import SimpleNamespace

    HYP = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    cases = (
        ("yolov6n.yaml", 64, [8, 16, 32]),
        ("yolov8n-p6.yaml", 128, [8, 16, 32, 64]),
        ("yolov8n-p2.yaml", 64, [4, 8, 16, 32]),
    )
    for yaml_name, imgsz, want in cases:
        m = build_model(yaml_name, task="detect", nc=2)
        assert list(m.strides) == want
        v = m.init(imgsz=imgsz)
        x = jnp.asarray(
            np.random.default_rng(0).random((1, imgsz, imgsz, 3), np.float32)
        )
        pred = m.predict(v, x)
        a = sum((imgsz // s) ** 2 for s in m.strides)
        assert pred.shape == (1, 6, a) and bool(jnp.isfinite(pred).all())
        # loss + grads flow through the extra pyramid levels
        batch = {
            "cls": jnp.zeros((1, 2), jnp.int32),
            "bboxes": jnp.zeros((1, 2, 4)).at[0, 0].set(
                jnp.asarray([0.5, 0.5, 0.4, 0.4])
            ),
            "mask_gt": jnp.zeros((1, 2), bool).at[0, 0].set(True),
        }

        def lf(p):
            feats, _ = m.raw_forward({**v, "params": p}, x, train=True)
            return detection_loss(feats, batch, m.strides, m.nc, HYP).total

        l0, g = jax.value_and_grad(lf)(v["params"])
        assert bool(jnp.isfinite(l0))
        assert all(
            bool(jnp.isfinite(t).all()) for t in jax.tree_util.tree_leaves(g)
        )


@pytest.mark.heavy
def test_hybrid_and_pose_p6_builds():
    """yolov8-rtdetr (C2f backbone + deformable head) and yolov8-pose-p6
    (4-level pose) from the reference v8 zoo."""
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.tasks import build_model

    m = build_model("yolov8n-rtdetr.yaml", task="rtdetr", nc=3)
    v = m.init(imgsz=64)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3), np.float32))
    pred = m.predict(v, x)
    assert pred.shape[-1] == 4 + 3 and bool(jnp.isfinite(pred).all())

    m2 = build_model("yolov8n-pose-p6.yaml", task="pose")
    assert list(m2.strides) == [8, 16, 32, 64] and m2.kpt_shape == (17, 3)
    v2 = m2.init(imgsz=128)
    x2 = jnp.asarray(np.random.default_rng(1).random((1, 128, 128, 3), np.float32))
    p2 = m2.predict(v2, x2)
    a = sum((128 // s) ** 2 for s in m2.strides)
    assert p2.shape == (1, 4 + 1 + 51, a) and bool(jnp.isfinite(p2).all())

def test_predict_visualize_feature_maps(tmp_path):
    """predict(visualize=True) dumps per-layer feature grids (reference
    predictor.py visualize -> plotting.py:573 feature_visualization)."""
    import numpy as np

    from yolo_contour_regression_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    img = np.full((80, 80, 3), 128, np.uint8)
    res = m.predict(img, imgsz=64, visualize=True, project=str(tmp_path))
    assert len(res) == 1
    vdir = tmp_path / "predict" / "features"
    pngs = list(vdir.rglob("features_*.png"))
    assert pngs, f"no feature grids written under {vdir}"
    # one grid per non-head layer
    assert len(pngs) >= 5


def test_predict_augmented_tta():
    """TTA (reference DetectionModel._predict_augment): the full-scale pass
    of predict_augmented must equal predict() minus the clipped tail level,
    the total anchor count must follow _clip_augmented arithmetic, and the
    flipped/scaled passes must land boxes near the unaugmented ones."""
    m = build_model(CFG / "v8" / "yolov8n.yaml", nc=4)
    v = m.init(imgsz=64)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    )
    base = np.asarray(m.predict(v, x))  # (1, 4+nc, A)
    tta = np.asarray(m.predict_augmented(v, x))
    A = base.shape[-1]
    nl = len(m.strides)
    g = sum(4 ** i for i in range(nl))
    tail = A // g
    # pass 1 (scale 1, no flip) is bit-identical to predict() minus the tail
    np.testing.assert_array_equal(tta[..., : A - tail], base[..., : A - tail])
    # total anchors: (A - A//g) + A(.83) + A(.67) - head(.67)
    def anchors(sz):
        import math

        gs = int(max(m.strides))
        side = math.ceil(sz / gs) * gs
        return sum((side // s) ** 2 for s in m.strides)

    a83, a67 = anchors(int(64 * 0.83)), anchors(int(64 * 0.67))
    want = (A - tail) + a83 + (a67 - (a67 // g) * 4 ** (nl - 1))
    assert tta.shape == (1, 4 + m.nc, want)
    # de-scaled centers stay in a sane frame (pad-region anchors of the
    # scaled passes may descale past imgsz — the reference clips after NMS)
    assert np.all(np.abs(tta[0, :2]) <= 2 * 64)


def test_predictor_tta_wiring(tmp_path):
    """augment=True reaches predict_augmented for detect and falls back (with
    a warning) for segment — reference predictor parity."""
    import cv2

    from yolo_contour_regression_tpu import YOLO

    img = (np.random.default_rng(0).uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    p = str(tmp_path / "im.jpg")
    cv2.imwrite(p, img)

    m = YOLO(str(CFG / "v8" / "yolov8n.yaml"), task="detect")
    res = m.predict(p, imgsz=64, augment=True, save=False, verbose=False)
    assert len(res) == 1  # ran through the TTA graph

    ms = YOLO("yolov8n-seg.yaml", task="segment")
    res = ms.predict(p, imgsz=64, augment=True, save=False, verbose=False)
    assert len(res) == 1  # warned + single-scale, still functional
