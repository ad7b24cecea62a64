"""SAM automatic everything-segmentation (reference models/sam/predict.py:178–294
generate + :366–408 remove_small_regions).

The AMG loop is validated end-to-end with a deterministic stub decoder whose
mask output depends only on which planted object contains the prompt point —
so "generate() recovers every planted object with no prompt" is checkable
exactly — plus numpy-oracle parity tests of the filtering math (stability
score, mask->box, crop-edge filter, greedy NMS, small-region cleanup).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_contour_regression_tpu.models.sam import Predictor, Sam
from yolo_contour_regression_tpu.models.sam.amg import (
    batched_mask_to_box,
    is_box_near_crop_edge,
    nms_boxes,
    remove_small_regions,
    stability_score,
)

S = 64  # model input size; image is S x S so canvas == image coords
HQ = S // 4  # low-res mask grid

# planted objects: 4px-aligned rectangles in image coords (exact at low res)
OBJECTS = [
    (8, 8, 24, 28),  # x0, y0, x1, y1
    (40, 12, 60, 32),
    (12, 40, 32, 60),
]


class StubSam:
    """Sam-compatible surface whose decoder 'knows' the planted objects:
    a prompt point inside object k returns that object's mask at high
    confidence; a background point returns low confidence. Pure jnp, so
    Predictor's jitted AMG batch traces it unchanged."""

    img_size = S
    mask_threshold = 0.0
    pixel_mean = np.zeros(3, np.float32)
    pixel_std = np.ones(3, np.float32)
    variables = {}

    def __init__(self):
        gt = np.zeros((len(OBJECTS), HQ, HQ), np.float32)
        for k, (x0, y0, x1, y1) in enumerate(OBJECTS):
            gt[k, y0 // 4 : y1 // 4, x0 // 4 : x1 // 4] = 1.0
        self.gt = jnp.asarray(gt)

    def encode_image(self, variables, image):
        return jnp.zeros((image.shape[0], HQ, HQ, 8))

    def decode_prompts(self, variables, emb, points, labels, masks=None,
                       multimask=True):
        pt = points[:, 0]  # (P, 2) model-input px (second point is the pad)
        ix = jnp.clip((pt[:, 0] // 4).astype(jnp.int32), 0, HQ - 1)
        iy = jnp.clip((pt[:, 1] // 4).astype(jnp.int32), 0, HQ - 1)
        inside = self.gt[:, iy, ix]  # (K, P)
        logits = jnp.einsum("kp,khw->phw", inside, self.gt * 20.0 - 10.0)
        hit = inside.sum(0) > 0
        logits = jnp.where(hit[:, None, None], logits, -10.0)
        logits = jnp.repeat(logits[:, None], 3, 1)  # (P, 3, HQ, HQ)
        iou = jnp.where(hit, 0.99, 0.05)[:, None] * jnp.ones((1, 3))
        return logits, iou


def _mask_iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


def test_generate_recovers_every_planted_object():
    pred = Predictor(StubSam())
    img = np.full((S, S, 3), 127, np.uint8)
    masks, scores, boxes = pred.generate(
        img, points_stride=16, points_batch_size=32, conf_thres=0.5
    )
    assert len(masks) == len(OBJECTS)
    assert masks.shape[1:] == (S, S)
    assert (scores > 0.9).all()
    for x0, y0, x1, y1 in OBJECTS:
        gt = np.zeros((S, S), bool)
        gt[y0:y1, x0:x1] = True
        ious = [_mask_iou(gt, m) for m in masks]
        assert max(ious) > 0.75, f"object {(x0, y0, x1, y1)} not recovered: {ious}"
        bx = boxes[int(np.argmax(ious))]
        assert np.abs(bx - [x0, y0, x1, y1]).max() <= 4  # low-res quantization


def test_generate_filters_low_confidence_everything():
    """Same loop with conf above the stub's 0.99 -> nothing survives."""
    pred = Predictor(StubSam())
    img = np.zeros((S, S, 3), np.uint8)
    masks, scores, boxes = pred.generate(img, points_stride=8, conf_thres=0.999)
    assert len(masks) == 0 and boxes.shape == (0, 4)


def test_generate_multicrop_runs_and_dedupes():
    """crop_n_layers=1: 5 crops, cross-crop NMS still returns each object once
    (the stub answers in canvas space, so only the full-image crop layer sees
    the true objects consistently — dedupe must not multiply them)."""
    pred = Predictor(StubSam())
    img = np.full((S, S, 3), 127, np.uint8)
    masks, scores, boxes = pred.generate(
        img, crop_n_layers=1, points_stride=16, conf_thres=0.5
    )
    assert len(masks) >= len(OBJECTS)
    # every planted object recovered at least once, no duplicate pair > 0.7 IoU
    for x0, y0, x1, y1 in OBJECTS:
        gt = np.zeros((S, S), bool)
        gt[y0:y1, x0:x1] = True
        assert max(_mask_iou(gt, m) for m in masks) > 0.7
    for i in range(len(masks)):
        for j in range(i + 1, len(masks)):
            bi, bj = boxes[i], boxes[j]
            inter = max(0, min(bi[2], bj[2]) - max(bi[0], bj[0])) * max(
                0, min(bi[3], bj[3]) - max(bi[1], bj[1])
            )
            union = (
                (bi[2] - bi[0]) * (bi[3] - bi[1])
                + (bj[2] - bj[0]) * (bj[3] - bj[1])
                - inter
            )
            assert inter / max(union, 1e-9) <= 0.7 + 1e-6


def test_stability_score_matches_device_path():
    """The in-graph stability computed by Predictor._amg_batch_fn equals the
    numpy amg.stability_score on the same logits."""
    pred = Predictor(StubSam())
    pts = jnp.asarray(np.array([[12.0, 12.0], [2.0, 2.0]], np.float32))
    emb = jnp.zeros((1, HQ, HQ, 8))
    logits, iou, stab = pred._amg_batch(
        StubSam.variables, emb, pts, jnp.float32(0.0), jnp.float32(1.0)
    )
    ref = stability_score(np.asarray(logits), 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(stab), ref, atol=1e-6)


def test_batched_mask_to_box_matches_loop_oracle():
    rng = np.random.default_rng(0)
    masks = rng.random((16, 13, 17)) > 0.8
    masks[3] = False  # empty mask -> zeros
    got = batched_mask_to_box(masks)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        exp = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1] if len(xs) else [0] * 4
        np.testing.assert_array_equal(got[i], np.asarray(exp, np.float32))


def test_crop_edge_filter_semantics():
    """Boxes at the crop edge are dropped unless that edge is also the image
    edge (reference amg.py is_box_near_crop_edge)."""
    crop, orig = [10, 10, 50, 50], [0, 0, 100, 100]
    boxes = np.array(
        [
            [11, 20, 30, 30],  # touches crop left edge (not image edge) -> near
            [20, 20, 30, 30],  # interior -> keep
            [1, 20, 30, 30],   # near image edge too... but crop x0=10, |1-10|<=20 -> near crop AND |1-0|<=20 near image -> kept
        ],
        np.float32,
    )
    near = is_box_near_crop_edge(boxes, crop, orig, atol=5.0)
    assert near.tolist() == [True, False, False]


def test_nms_boxes_greedy():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms_boxes(boxes, scores, 0.5)
    assert keep.tolist() == [0, 2]
    assert nms_boxes(np.zeros((0, 4)), np.zeros(0), 0.5).shape == (0,)


def test_remove_small_regions_holes_and_islands():
    m = np.zeros((20, 20), bool)
    m[2:18, 2:18] = True
    m[8:10, 8:10] = False  # small hole
    m[0, 19] = True  # 1-px island
    filled, ch = remove_small_regions(m, 8, mode="holes")
    assert ch and filled[8, 8] and filled[0, 19]
    cleaned, ch = remove_small_regions(filled, 8, mode="islands")
    assert ch and not cleaned[0, 19] and cleaned[8, 8]
    # keep-largest fallback when everything is below threshold
    tiny = np.zeros((6, 6), bool)
    tiny[0, 0] = True
    tiny[3:5, 3:5] = True
    kept, _ = remove_small_regions(tiny, 100, mode="islands")
    assert kept[3, 3] and not kept[0, 0]


def test_predictor_remove_small_regions_static():
    m = np.zeros((2, 20, 20), bool)
    m[0, 2:18, 2:18] = True
    m[0, 8:10, 8:10] = False
    m[1, 2:18, 2:18] = True  # clean duplicate of mask 0's box
    out, keep = Predictor.remove_small_regions(m, min_area=8, nms_thresh=0.7)
    assert len(out) == 1 and keep.tolist() == [1]  # unchanged mask preferred
    assert out[0, 8, 8]


def test_mask_prompt_changes_decode():
    """Low-res mask prompts flow through decode (reference predict.py:105)."""
    sam = Sam(variant="sam_b", img_size=S)
    sam.init()
    pred = Predictor(sam)
    img = np.full((S, S, 3), 127, np.uint8)
    pred.set_image(img)
    m0, iou0 = pred.predict(point_coords=[[32, 32]], point_labels=[1])
    prompt_mask = np.zeros((S // 4, S // 4), np.float32)
    prompt_mask[4:12, 4:12] = 8.0
    m1, iou1, lowres = pred.predict(
        point_coords=[[32, 32]], point_labels=[1],
        mask_input=prompt_mask, return_logits=True,
    )
    assert m1.shape == m0.shape and lowres.shape == (3, S // 4, S // 4)
    assert not np.allclose(iou0, iou1)
    # iterative prompting: feed back the best previous low-res logits
    best = lowres[int(np.argmax(iou1))]
    m2, _ = pred.predict(
        point_coords=[[32, 32]], point_labels=[1], mask_input=best
    )
    assert m2.shape == m0.shape
