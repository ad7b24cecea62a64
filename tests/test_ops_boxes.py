import jax.numpy as jnp
import numpy as np

from yolo_contour_regression_tpu.ops import boxes as B


def test_xywh_xyxy_roundtrip():
    x = jnp.array([[10.0, 20.0, 4.0, 6.0], [0.0, 0.0, 2.0, 2.0]])
    xyxy = B.xywh2xyxy(x)
    np.testing.assert_allclose(xyxy, [[8, 17, 12, 23], [-1, -1, 1, 1]])
    np.testing.assert_allclose(B.xyxy2xywh(xyxy), x, atol=1e-6)


def test_box_iou_pairwise():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = B.box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-5)


def test_bbox_iou_variants_ordering():
    b1 = jnp.array([5.0, 5.0, 4.0, 4.0])  # xywh
    b2 = jnp.array([6.0, 6.0, 4.0, 4.0])
    plain = B.bbox_iou(b1, b2)
    giou = B.bbox_iou(b1, b2, GIoU=True)
    diou = B.bbox_iou(b1, b2, DIoU=True)
    ciou = B.bbox_iou(b1, b2, CIoU=True)
    assert 0 < plain < 1
    # penalized variants never exceed plain IoU
    assert giou <= plain + 1e-6
    assert diou <= plain + 1e-6
    assert ciou <= plain + 1e-6
    # identical boxes: all variants = 1
    same = B.bbox_iou(b1, b1, CIoU=True)
    np.testing.assert_allclose(same, 1.0, atol=1e-5)


def test_dist2bbox_bbox2dist_roundtrip():
    anchors = jnp.array([[10.0, 10.0], [3.0, 7.0]])
    ltrb = jnp.array([[2.0, 3.0, 4.0, 5.0], [1.0, 1.0, 2.0, 2.0]])
    xyxy = B.dist2bbox(ltrb, anchors, xywh=False)
    np.testing.assert_allclose(xyxy, [[8, 7, 14, 15], [2, 6, 5, 9]])
    back = B.bbox2dist(anchors, xyxy, reg_max=16)
    np.testing.assert_allclose(back, ltrb, atol=1e-6)


def test_scale_boxes_letterbox_inverse():
    # 640x640 letterboxed from a 480x640 original: gain=1, pad_y=80
    boxes = jnp.array([[100.0, 180.0, 200.0, 280.0]])
    rp = B.letterbox_ratio_pad((640, 640), (480, 640))
    np.testing.assert_allclose(rp, [1.0, 0.0, 80.0], atol=1e-6)
    out = B.scale_boxes(boxes, rp, jnp.array([480.0, 640.0]))
    np.testing.assert_allclose(out, [[100, 100, 200, 200]], atol=1e-5)
