"""SAM / FastSAM / NAS family surfaces + AutoBackend + checks/jax_utils."""
from pathlib import Path

import numpy as np
import pytest

CFG = Path(__file__).parent.parent / "yolo_contour_regression_tpu/cfg/models"


@pytest.mark.heavy
def test_sam_prompt_pipeline():
    from yolo_contour_regression_tpu.models.sam import Predictor, Sam

    sam = Sam(variant="sam_b", img_size=64)
    sam.init()
    pred = Predictor(sam)
    img = np.full((48, 56, 3), 128, np.uint8)
    pred.set_image(img)
    masks, iou = pred.predict(point_coords=[[28, 24]], point_labels=[1])
    assert masks.shape == (3, 48, 56) and iou.shape == (3,)
    masks2, _ = pred.predict(box=[5, 5, 40, 40], multimask_output=True)
    assert masks2.shape == (3, 48, 56)


def test_sam_amg_utils():
    from yolo_contour_regression_tpu.models.sam import (
        generate_crop_boxes,
        point_grid,
        stability_score,
    )
    from yolo_contour_regression_tpu.models.sam.amg import batched_mask_to_box

    g = point_grid(8)
    assert g.shape == (64, 2) and (g > 0).all() and (g < 1).all()
    boxes, layers = generate_crop_boxes((100, 200), n_layers=1)
    assert boxes[0] == [0, 0, 200, 100] and max(layers) == 1
    m = np.zeros((1, 10, 10), bool)
    m[0, 2:5, 3:7] = True
    np.testing.assert_array_equal(batched_mask_to_box(m)[0], [3, 2, 7, 5])
    s = stability_score(np.full((1, 4, 4), 0.6), 0.5, 0.05)
    assert s[0] == 1.0


def test_fastsam_prompts():
    from yolo_contour_regression_tpu.engine.results import Results
    from yolo_contour_regression_tpu.models.fastsam import FastSAMPrompt

    img = np.zeros((32, 32, 3), np.uint8)
    masks = np.zeros((2, 32, 32), bool)
    masks[0, 4:12, 4:12] = True
    masks[1, 20:30, 20:30] = True
    res = Results(img, "x.jpg", {0: "obj"},
                  boxes=np.array([[4, 4, 12, 12, 0.9, 0], [20, 20, 30, 30, 0.8, 0]]),
                  masks=masks)
    p = FastSAMPrompt(img, [res])
    assert p.everything_prompt().shape == (2, 32, 32)
    sel = p.box_prompt([3, 3, 13, 13])
    np.testing.assert_array_equal(sel[0], masks[0])
    pts = p.point_prompt([[25, 25]], [1])
    np.testing.assert_array_equal(pts[0], masks[1])
    with pytest.raises(ImportError):
        p.text_prompt("a dog")


def test_nas_pt_raises_with_guidance():
    """NAS is a native architecture now (tests/test_nas.py); only the
    torch-pickle .pt route still raises, pointing at the converter."""
    from yolo_contour_regression_tpu.models.nas import NAS

    with pytest.raises(NotImplementedError, match="super-gradients"):
        NAS("yolo_nas_s.pt")


def test_autobackend_yaml_and_ckpt(tmp_path):
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.autobackend import AutoBackend

    be = AutoBackend(str(CFG / "yolov8-seg.yaml"))
    out = be(jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 122, 84)
    with pytest.raises(ValueError, match="unsupported artifact"):
        AutoBackend("model.engine")


def test_checks():
    from yolo_contour_regression_tpu.utils.checks import (
        check_imgsz,
        check_version,
        check_file,
    )

    assert check_imgsz(100, stride=32) == 128
    assert check_imgsz([640, 480], stride=32) == [640, 480]
    assert check_version("1.2.3", ">=1.0.0")
    assert not check_version("0.9", ">=1.0.0")
    assert check_file("yolov8-seg.yaml").endswith("yolov8-seg.yaml")
    with pytest.raises(FileNotFoundError):
        check_file("no_such_file_xyz.yaml")


def test_model_info_flops():
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.jax_utils import model_info

    m = build_model(CFG / "yolov8-seg.yaml")
    m.init(imgsz=64)
    info = model_info(m, imgsz=64, verbose=False)
    assert info["parameters"] > 1e6
    assert info["GFLOPs"] is None or info["GFLOPs"] > 0


@pytest.mark.heavy
def test_mobile_sam_tinyvit_pipeline():
    """MobileSAM variant: TinyViT encoder ends at 1/16 with the 256-ch SAM
    neck and plugs into the same prompt pipeline (reference build_mobile_sam)."""
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.models.sam import Predictor, Sam

    sam = Sam(variant="mobile_sam", img_size=64)
    v = sam.init()
    emb = sam.encode_image(v, jnp.zeros((1, 64, 64, 3)))
    assert emb.shape == (1, 4, 4, 256)  # 64/16
    pred = Predictor(sam)
    img = np.full((48, 56, 3), 128, np.uint8)
    pred.set_image(img)
    masks, iou = pred.predict(point_coords=[[28, 24]], point_labels=[1])
    assert masks.shape == (3, 48, 56) and iou.shape == (3,)

    # TinyViT-5M must be far smaller than ViT-B (the point of MobileSAM)
    import jax

    n_tiny = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["encoder"]))
    assert n_tiny < 15e6
