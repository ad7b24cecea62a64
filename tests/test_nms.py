import jax.numpy as jnp
import numpy as np

from yolo_contour_regression_tpu.ops.nms import batched_nms, non_max_suppression


def test_batched_nms_suppresses_overlaps():
    boxes = jnp.array(
        [
            [0.0, 0, 10, 10],
            [1.0, 1, 11, 11],  # high overlap with box 0, lower score -> suppressed
            [50.0, 50, 60, 60],  # far away -> kept
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    classes = jnp.zeros(3, jnp.int32)
    extras = jnp.zeros((3, 2))
    out = batched_nms(boxes, scores, classes, extras, conf_thres=0.25, iou_thres=0.5, pre_nms=3, max_det=3)
    assert out["valid"].tolist() == [True, True, False]
    np.testing.assert_allclose(out["scores"][:2], [0.9, 0.7], atol=1e-6)
    np.testing.assert_allclose(out["boxes"][1], [50, 50, 60, 60])


def test_nms_class_aware():
    # same location, different classes: both survive (class-offset trick)
    boxes = jnp.array([[0.0, 0, 10, 10], [0.0, 0, 10, 10]])
    scores = jnp.array([0.9, 0.8])
    classes = jnp.array([0, 1], jnp.int32)
    extras = jnp.zeros((2, 1))
    out = batched_nms(boxes, scores, classes, extras, conf_thres=0.25, iou_thres=0.5, pre_nms=2, max_det=2)
    assert out["valid"].tolist() == [True, True]
    # agnostic: one suppressed
    out2 = batched_nms(boxes, scores, classes, extras, conf_thres=0.25, iou_thres=0.5, pre_nms=2, max_det=2, agnostic=True)
    assert out2["valid"].tolist() == [True, False]


def test_nms_conf_gate():
    boxes = jnp.array([[0.0, 0, 10, 10], [30.0, 30, 40, 40]])
    scores = jnp.array([0.9, 0.1])
    classes = jnp.zeros(2, jnp.int32)
    extras = jnp.zeros((2, 1))
    out = batched_nms(boxes, scores, classes, extras, conf_thres=0.25, iou_thres=0.5, pre_nms=2, max_det=2)
    assert out["valid"].tolist() == [True, False]


def test_non_max_suppression_head_layout():
    # (B, 4+nc+E, A) layout with nc=2, E=3, A=4
    A, nc, E = 4, 2, 3
    pred = np.zeros((1, 4 + nc + E, A), np.float32)
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [40, 40, 50, 50], [0, 0, 1, 1]], np.float32)
    pred[0, :4] = boxes.T
    pred[0, 4] = [0.9, 0.85, 0.0, 0.0]  # class 0 scores
    pred[0, 5] = [0.0, 0.0, 0.7, 0.1]  # class 1 scores
    pred[0, 6:] = np.arange(3 * A, dtype=np.float32).reshape(3, A)
    out = non_max_suppression(jnp.asarray(pred), nc=nc, conf_thres=0.25, iou_thres=0.5, pre_nms=4, max_det=4)
    valid = np.asarray(out["valid"][0])
    assert valid.tolist() == [True, True, False, False]
    np.testing.assert_allclose(out["scores"][0][:2], [0.9, 0.7], atol=1e-6)
    assert out["classes"][0][:2].tolist() == [0, 1]
    # extras carried through for the kept top box (anchor 0)
    np.testing.assert_allclose(out["extras"][0][0], [0, 4, 8])


def numpy_greedy_nms(boxes, scores, iou_thres):
    """Sequential reference implementation (torchvision.ops.nms semantics)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + areas - inter + 1e-7)
        suppressed |= iou > iou_thres
        suppressed[i] = False
    return sorted(keep)


def test_fixpoint_nms_matches_sequential_greedy():
    rng = np.random.default_rng(42)
    for trial in range(5):
        n = 64
        centers = rng.uniform(20, 200, (n, 2))
        wh = rng.uniform(10, 60, (n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
        scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
        want = numpy_greedy_nms(boxes, scores, 0.5)
        out = batched_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros(n, jnp.int32),
            jnp.zeros((n, 1)), conf_thres=0.0, iou_thres=0.5, pre_nms=n,
            max_det=n, agnostic=True,
        )
        got_scores = np.asarray(out["scores"])[np.asarray(out["valid"])]
        want_scores = np.sort(scores[want])[::-1]
        np.testing.assert_allclose(np.sort(got_scores)[::-1], want_scores, atol=1e-6)


def test_parts_path_matches_reference_layout_pipeline():
    """The deploy hot path (predict_parts -> non_max_suppression_parts ->
    finalize_polar_extras) is numerically identical to the reference-layout
    pipeline (predict -> non_max_suppression), which stays the export
    contract. Covers boxes/scores/classes/valid AND the reconstructed 108
    contour columns."""
    import jax

    from yolo_contour_regression_tpu.nn.modules.head import finalize_polar_extras
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.ops.nms import non_max_suppression_parts

    m = build_model(
        "yolo_contour_regression_tpu/cfg/models/yolov8-seg.yaml", nc=3
    )
    v = m.init(imgsz=64)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    )
    kw = dict(conf_thres=0.001, iou_thres=0.7, pre_nms=64, max_det=10)

    ref = non_max_suppression(m.predict(v, x), nc=m.nc, **kw)
    boxes, scores, extras = m.predict_parts(v, x)
    got = non_max_suppression_parts(boxes, scores, extras, **kw)

    np.testing.assert_array_equal(np.asarray(ref["valid"]), np.asarray(got["valid"]))
    np.testing.assert_array_equal(np.asarray(ref["classes"]), np.asarray(got["classes"]))
    np.testing.assert_allclose(np.asarray(ref["scores"]), np.asarray(got["scores"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref["boxes"]), np.asarray(got["boxes"]), atol=1e-4)
    fin = finalize_polar_extras(got["extras"])
    fin = jnp.where(got["valid"][..., None], fin, 0)
    np.testing.assert_allclose(np.asarray(ref["extras"]), np.asarray(fin), atol=1e-4)


def test_parts_path_bf16_inputs():
    """bf16 decode outputs flow through the parts NMS: candidates are
    promoted to f32 before the class-offset IoU (a bf16 MAX_WH shift would
    eat the coordinate mantissa), outputs are f32."""
    from yolo_contour_regression_tpu.ops.nms import non_max_suppression_parts

    rng = np.random.default_rng(1)
    A = 128
    centers = rng.uniform(40, 600, (1, A, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, (1, A, 2)).astype(np.float32)
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
    scores = rng.uniform(0, 1, (1, A, 5)).astype(np.float32)
    extras = rng.uniform(0, 1, (1, A, 7)).astype(np.float32)

    f32 = non_max_suppression_parts(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(extras),
        conf_thres=0.25, iou_thres=0.7, pre_nms=64, max_det=20,
    )
    b16 = non_max_suppression_parts(
        jnp.asarray(boxes, jnp.bfloat16), jnp.asarray(scores, jnp.bfloat16),
        jnp.asarray(extras, jnp.bfloat16),
        conf_thres=0.25, iou_thres=0.7, pre_nms=64, max_det=20,
    )
    assert b16["boxes"].dtype == jnp.float32
    assert b16["scores"].dtype == jnp.float32
    # bf16 rounds near-tie scores, which reorders top_k and can flip which
    # of two overlapping boxes suppresses the other — so compare survivor
    # SETS: every bf16 survivor must match an f32 survivor within bf16 box
    # resolution (or be one of a small tie-flip count)
    assert abs(int(f32["valid"].sum()) - int(b16["valid"].sum())) <= 2
    fb = np.asarray(f32["boxes"])[0][np.asarray(f32["valid"])[0]]
    bb = np.asarray(b16["boxes"])[0][np.asarray(b16["valid"])[0]]
    dist = np.abs(bb[:, None, :] - fb[None, :, :]).max(-1).min(-1)  # per-b16 nearest
    assert (dist < 4.0).mean() > 0.85, dist


def test_logits_path_matches_probability_path():
    """scores_are_logits=True (sigmoid applied after the per-anchor
    reduction) selects the same detections with the same probabilities as
    the sigmoid-scores path — in both best-class (predict) and multi-label
    (val) modes, across conf thresholds."""
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.ops.nms import non_max_suppression_parts

    m = build_model(
        "yolo_contour_regression_tpu/cfg/models/yolov8-seg.yaml", nc=3
    )
    v = m.init(imgsz=64)
    x = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    )
    boxes, probs, extras = m.predict_parts(v, x)
    _, logits, _ = m.predict_parts(v, x, sigmoid=False)
    for conf in (0.001, 0.25):
        for ml in (False, True):
            kw = dict(conf_thres=conf, iou_thres=0.7, pre_nms=64, max_det=10,
                      multi_label=ml)
            want = non_max_suppression_parts(boxes, probs, extras, **kw)
            got = non_max_suppression_parts(
                boxes, logits, extras, scores_are_logits=True, **kw
            )
            np.testing.assert_array_equal(
                np.asarray(want["valid"]), np.asarray(got["valid"]), err_msg=f"{conf} {ml}"
            )
            np.testing.assert_array_equal(
                np.asarray(want["classes"]), np.asarray(got["classes"])
            )
            np.testing.assert_allclose(
                np.asarray(want["scores"]), np.asarray(got["scores"]), atol=2e-6
            )
            np.testing.assert_allclose(
                np.asarray(want["boxes"]), np.asarray(got["boxes"]), atol=1e-4
            )


def test_topk_path_matches_parts_pipeline():
    """Filter-before-decode (predict_topk -> non_max_suppression_selected) is
    bit-identical to the parts pipeline at the same pre_nms: candidate
    selection on raw logits is monotonic under sigmoid, so the same anchors
    are picked, then decoded identically."""
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.ops.nms import (
        non_max_suppression_parts,
        non_max_suppression_selected,
    )

    m = build_model(
        "yolo_contour_regression_tpu/cfg/models/yolov8-seg.yaml", nc=3
    )
    v = m.init(imgsz=64)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    )
    for conf in (0.25, 0.001):
        kw = dict(conf_thres=conf, iou_thres=0.7, max_det=10)

        pb, pl, pe = m.predict_parts(v, x, sigmoid=False)
        ref = non_max_suppression_parts(
            pb, pl, pe, pre_nms=64, scores_are_logits=True, **kw
        )
        boxes, scores, classes, extras = m.predict_topk(v, x, k=64, conf_thres=conf)
        got = non_max_suppression_selected(boxes, scores, classes, extras, **kw)

        np.testing.assert_array_equal(np.asarray(ref["valid"]), np.asarray(got["valid"]))
        np.testing.assert_array_equal(np.asarray(ref["classes"]), np.asarray(got["classes"]))
        np.testing.assert_array_equal(np.asarray(ref["scores"]), np.asarray(got["scores"]))
        np.testing.assert_array_equal(np.asarray(ref["boxes"]), np.asarray(got["boxes"]))
        np.testing.assert_array_equal(np.asarray(ref["extras"]), np.asarray(got["extras"]))
