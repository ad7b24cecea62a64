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


def test_rtdetr_head_init_priors(rtdetr):
    """DETR convergence priors (reference head.py:996-1008
    _reset_parameters): every score head starts at the 0.01 background
    prior (bias -4.595) and every bbox-delta MLP's last layer is zeroed so
    queries begin exactly at their anchors — the r5 overfit-8 diagnostic
    showed training cannot memorize even 8 images without them."""
    import math

    m, v = rtdetr
    params = v["params"]
    head = next(p for k, p in params.items() if "enc_score_head" in p or "dec_score_head0" in p)
    prior = -math.log((1 - 0.01) / 0.01)
    np.testing.assert_allclose(head["enc_score_head"]["bias"], prior, atol=1e-6)
    i = 0
    while f"dec_score_head{i}" in head:
        np.testing.assert_allclose(head[f"dec_score_head{i}"]["bias"], prior, atol=1e-6)
        last = sorted(k for k in head[f"dec_bbox_head{i}"] if k.startswith("layers"))[-1]
        assert np.all(np.asarray(head[f"dec_bbox_head{i}"][last]["kernel"]) == 0)
        i += 1
    assert i >= 1
    last = sorted(k for k in head["enc_bbox_head"] if k.startswith("layers"))[-1]
    assert np.all(np.asarray(head["enc_bbox_head"][last]["kernel"]) == 0)


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


def test_hungarian_assign_optimal_vs_scipy_oracle():
    """The in-graph auction solve (no host callback — the TPU backend has
    none) must match scipy's optimal assignment cost on realistic geometries,
    including crowd scenes where near-duplicate gts contest the same
    queries."""
    from scipy.optimize import linear_sum_assignment

    from yolo_contour_regression_tpu.models.utils.loss import hungarian_assign

    rng = np.random.default_rng(7)
    Q, G = 300, 48

    def crowd_cost():
        centers = np.repeat(rng.uniform(0, 1, (G // 4, 4)), 4, axis=0)
        qpred = centers[rng.integers(0, G, Q)] + rng.normal(0, 0.02, (Q, 4))
        return (np.abs(qpred[:, None, :] - centers[None, :, :]).sum(-1) * 5)

    costs, n_valid = [], []
    for kind in range(4):
        c = rng.uniform(0, 10, (Q, G)) if kind % 2 == 0 else crowd_cost()
        g = int(rng.integers(1, G + 1))
        c[:, g:] = 1e6  # padded-gt columns, like match_cost
        costs.append(c.astype(np.float32))
        n_valid.append(g)
    out = np.asarray(
        hungarian_assign(jnp.asarray(np.stack(costs)), jnp.asarray(n_valid))
    )
    for c, g, a in zip(costs, n_valid, out):
        assert (a[g:] == -1).all()
        sel = a[:g]
        assert (sel >= 0).all() and len(set(sel.tolist())) == g
        mine = c[sel, np.arange(g)].sum()
        rows, cols = linear_sum_assignment(c[:, :g])
        opt = c[rows, cols].sum()
        assert mine <= opt * (1 + 1e-4) + 1e-4, (mine, opt)


@pytest.mark.heavy
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


def test_cdn_group_shapes_and_noise():
    from yolo_contour_regression_tpu.models.utils.ops import get_cdn_group

    batch = {
        "bboxes": jnp.zeros((2, 4, 4)).at[:, 0].set(jnp.asarray([0.5, 0.5, 0.3, 0.3])),
        "cls": jnp.ones((2, 4), jnp.int32),
        "mask_gt": jnp.zeros((2, 4), bool).at[:, 0].set(True),
    }
    dn = get_cdn_group(batch, nc=80, key=jax.random.PRNGKey(0), num_dn=16)
    G = 16 // 4
    assert dn["labels"].shape == (2, G, 2, 4)
    assert dn["boxes_logit"].shape == (2, G, 2, 4, 4)
    assert np.isfinite(np.asarray(dn["boxes_logit"])).all()
    # negative copies are pushed further from the GT than positives
    import jax.nn as jnn

    boxes = np.asarray(jnn.sigmoid(dn["boxes_logit"]))
    gt = np.asarray([0.5, 0.5, 0.3, 0.3])
    d_pos = np.abs(boxes[:, :, 0, 0, :2] - gt[:2]).sum(-1).mean()
    d_neg = np.abs(boxes[:, :, 1, 0, :2] - gt[:2]).sum(-1).mean()
    assert d_neg > d_pos


@pytest.mark.heavy
def test_rtdetr_cdn_train_step(rtdetr):
    """CDN groups flow through the decoder; dn losses appear and all grads
    (incl. the denoising class embedding) are finite (VERDICT item #8)."""
    m, v = rtdetr
    from yolo_contour_regression_tpu.engine.step import make_loss_fn
    from types import SimpleNamespace

    hyp = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    loss_fn = make_loss_fn(m, hyp)
    batch = {
        "bboxes": jnp.zeros((1, 4, 4)).at[0, 0].set(jnp.asarray([0.5, 0.5, 0.3, 0.3])),
        "cls": jnp.zeros((1, 4), jnp.int32),
        "mask_gt": jnp.zeros((1, 4), bool).at[0, 0].set(True),
    }
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    )

    def f(params):
        total, (items, _) = loss_fn(params, v.get("batch_stats", {}), x, batch, 3)
        return total, items

    (total, items), grads = jax.value_and_grad(f, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    assert "dn_cls_loss" in items and "dn_giou_loss" in items
    assert float(items["dn_cls_loss"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the denoising embedding exists and receives gradient
    head_key = [k for k in grads if k.startswith("layer")][-1]
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dn_grads = [g for p, g in flat if any("denoising" in str(k) for k in p)]
    assert dn_grads and any(float(jnp.abs(g).sum()) > 0 for g in dn_grads)


@pytest.mark.slow
def test_rtdetr_val_native_space(rtdetr, tmp_path):
    """RTDETRValidator runs the padded fixed-shape loader protocol and
    matches in native image space."""
    from tests.helpers import make_shape_dataset
    from yolo_contour_regression_tpu.cfg import get_cfg
    from yolo_contour_regression_tpu.models.rtdetr.val import RTDETRValidator

    m, v = rtdetr
    yaml_path = make_shape_dataset(tmp_path, n_train=2, n_val=3, imgsz=48, img_w=96)
    val = RTDETRValidator(args=get_cfg(overrides={
        "imgsz": 64, "batch": 2, "task": "rtdetr", "conf": 0.3,
    }))
    res = val(model=m, variables=v, data=str(yaml_path))
    assert "metrics/mAP50-95(B)" in res and np.isfinite(res["metrics/mAP50-95(B)"])


def test_rtdetr_fuse_parity():
    """Deploy fuse must fold the head's input_proj conv+BN too (regression:
    raw nn.Conv + nn.BatchNorm siblings stranded the running stats and
    crashed fused predict)."""
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.nn.fuse import fuse_variables
    from yolo_contour_regression_tpu.nn.tasks import build_model

    m = build_model("rtdetr-l.yaml", task="rtdetr", nc=3)
    v = m.init(imgsz=64)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3), np.float32))
    ref = m.predict(v, x)
    fv, fm = fuse_variables(m, v)
    got = fm.predict(fv, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_vfl_matches_reference_formula():
    """detr_layer_loss's class term == the reference VarifocalLoss math
    (utils/loss.py:22: weight = 0.75*p^2*(1-onehot) + iou*onehot, BCE against
    the IoU-scaled one-hot, summed / num_gts) on a hand-built assignment."""
    from yolo_contour_regression_tpu.models.utils.loss import detr_layer_loss
    from yolo_contour_regression_tpu.ops.boxes import bbox_iou, xywh2xyxy

    rng = np.random.default_rng(7)
    B, Q, G, nc = 2, 6, 3, 4
    pred_boxes = jnp.asarray(rng.uniform(0.2, 0.8, (B, Q, 4)), jnp.float32)
    pred_logits = jnp.asarray(rng.normal(0, 1, (B, Q, nc)), jnp.float32)
    gt_boxes = jnp.asarray(rng.uniform(0.2, 0.8, (B, G, 4)), jnp.float32)
    gt_labels = jnp.asarray(rng.integers(0, nc, (B, G)), jnp.int32)
    mask_gt = jnp.asarray([[True, True, False], [True, False, False]])
    assign = jnp.asarray([[0, 3, -1], [5, -1, -1]], jnp.int32)

    lc, _, _ = detr_layer_loss(
        pred_boxes, pred_logits, gt_boxes, gt_labels, mask_gt, assign, nc
    )

    # independent numpy oracle of the reference formula
    p = 1.0 / (1.0 + np.exp(-np.asarray(pred_logits)))
    onehot = np.zeros((B, Q, nc))
    gt_score = np.zeros((B, Q, nc))
    n_gt = 0
    for b in range(B):
        for g in range(G):
            if not bool(mask_gt[b, g]):
                continue
            q = int(assign[b, g])
            iou = float(
                bbox_iou(
                    xywh2xyxy(pred_boxes[b, q]), xywh2xyxy(gt_boxes[b, g]),
                    xywh=False,
                )
            )
            c = int(gt_labels[b, g])
            onehot[b, q, c] = 1.0
            gt_score[b, q, c] = max(iou, 0.0)
            n_gt += 1
    w = 0.75 * p**2 * (1 - onehot) + gt_score * onehot
    bce = -(gt_score * np.log(p + 1e-8) + (1 - gt_score) * np.log(1 - p + 1e-8))
    expect = (w * bce).sum() / n_gt
    np.testing.assert_allclose(float(lc), expect, rtol=1e-5)


def test_decoder_refinement_chain_gradient():
    """The reference's iterative-refinement chaining (transformer.py decoder
    loop): layer i>0's aux box keeps a gradient path through layer i-1's
    bbox head (via the UNdetached last_refined_bbox), while the refer fed
    forward is detached. Regression-pins the r5 fix."""
    from yolo_contour_regression_tpu.nn.modules.head import RTDETRDecoder

    dec = RTDETRDecoder(nc=3, hd=32, nq=8, ndl=2, nh=2, d_ffn=32)
    feats = [jnp.ones((1, 4, 4, 16)), jnp.ones((1, 2, 2, 16))]
    v = dec.init(jax.random.PRNGKey(0), feats, train=True)

    def loss_of_layer1_boxes(params):
        (dec_bboxes, _, _, _), _ = dec.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            feats, train=True, mutable=["batch_stats"],
        )
        return (dec_bboxes[1] ** 2).sum()  # ONLY the second layer's aux box

    grads = jax.grad(loss_of_layer1_boxes)(v["params"])
    g0 = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["dec_bbox_head0"])
    )
    assert g0 > 0, (
        "layer-1 aux box loss must backprop into layer-0's bbox head "
        "(undetached last_refined chain)"
    )
