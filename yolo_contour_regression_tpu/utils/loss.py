"""Training losses — pure, jit-able functions over fixed-shape batches.

TPU-native re-implementation of the reference loss layer (utils/loss.py):
  - ``segmentation_loss``: the active polar loss ``v8SegmentationLoss``
    (loss.py:772-878): polar-IoU ray loss + BCE cls, v8-TAL polar assignment.
  - ``detection_loss``: stock ``oriv8DetectionLoss`` (loss.py:414-506):
    CIoU + DFL + BCE with stock TAL (alpha=0.5, beta=6.0).
  - ``classification_loss``: ``v8ClassificationLoss`` (loss.py:1107): CE/64.
  - ``pose_loss``: ``v8PoseLoss`` (loss.py:1019): detect loss + OKS-style kpt
    location loss + kpt-visibility BCE.

GT batches arrive dense: (B, N_max) padded instances with a validity mask —
the ragged ``batch_idx`` bucketing of the reference (loss.py:215 preprocess)
happens once on the host in the data pipeline, not per step on device.

Deliberate fix vs reference: contour GT scaling is per-point (x*w, y*h); the
reference scales the flattened 720-vector halves (loss.py:236-237), which is
only correct for square imgsz (SURVEY.md §2.1 quirk (a)).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..nn.modules.head import flatten_levels
from ..ops import polar as polar_ops
from ..ops.boxes import bbox2dist, bbox_iou, dist2bbox, xywh2xyxy
from .tal import polar_task_aligned_assign, task_aligned_assign


class LossOut(NamedTuple):
    total: jnp.ndarray
    items: Dict[str, jnp.ndarray]


def _bce(logits, targets):
    return optax.sigmoid_binary_cross_entropy(logits, targets)


def focal_loss(logits, targets, gamma: float = 1.5, alpha: float = 0.25):
    """Focal loss (reference loss.py:31 FocalLoss): BCE modulated by
    (1 - p_t)^gamma with optional alpha class balance."""
    p = jax.nn.sigmoid(logits)
    bce = _bce(logits, targets)
    p_t = targets * p + (1 - targets) * (1 - p)
    mod = (1.0 - p_t) ** gamma
    if alpha > 0:
        mod = mod * (targets * alpha + (1 - targets) * (1 - alpha))
    return bce * mod


def varifocal_loss(pred_logits, gt_score, label, gamma: float = 2.0, alpha: float = 0.75):
    """Varifocal loss (reference loss.py:16 VarifocalLoss): IoU-aware targets
    weighted asymmetrically for positives vs negatives."""
    p = jax.nn.sigmoid(pred_logits)
    weight = alpha * (p**gamma) * (1 - label) + gt_score * label
    return _bce(pred_logits, gt_score) * weight


def segmentation_loss(
    feats: Sequence[jnp.ndarray],  # per-level (B, H, W, 36+nc) raw maps
    batch: Dict[str, jnp.ndarray],  # cls (B,N), bboxes (B,N,4) xywh norm,
    #                                  segments (B,N,360,2) norm, mask_gt (B,N)
    strides: Sequence[int],
    nc: int,
    hyp,
    cand=128,
) -> LossOut:
    """Polar segmentation loss (reference v8SegmentationLoss, loss.py:772).
    ``cand`` None/0/'auto' -> imgsz-adaptive cap (tal.resolve_cand)."""
    nm = polar_ops.NUM_RAYS
    B = feats[0].shape[0]
    dt = jnp.float32  # assigner/loss math in f32 even if model ran bf16

    x = flatten_levels(feats).astype(dt)  # (B, A, nm+nc)
    pred_rays, pred_scores = x[..., :nm], x[..., nm:]
    from .tal import resolve_cand

    cand = resolve_cand(
        cand, x.shape[1], n_pad=batch["cls"].shape[1],
        balance=bool(getattr(hyp, "cand_balance", True)),
    )

    feat_hw = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, stride_t = polar_ops.make_anchors(feat_hw, strides, dtype=dt)
    img_h = feat_hw[0][0] * strides[0]
    img_w = feat_hw[0][1] * strides[0]

    # GT to pixel space (per-point scaling — see module docstring)
    scale4 = jnp.asarray([img_w, img_h, img_w, img_h], dt)
    gt_bboxes = xywh2xyxy(batch["bboxes"].astype(dt) * scale4)
    gt_contours = batch["segments"].astype(dt) * jnp.asarray([img_w, img_h], dt)
    gt_labels = batch["cls"].astype(jnp.int32)
    mask_gt = batch["mask_gt"].astype(bool)

    pred_rays_px = pred_rays * stride_t[None, :, :]  # (B, A, 36)

    assign = polar_task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_rays_px),
        anchor_points * stride_t,
        gt_labels,
        gt_bboxes,
        gt_contours,
        mask_gt,
        alpha=0.5,
        beta=4.0,
        topk=10,
        cand=cand,
    )

    target_scores_sum = jnp.maximum(assign.target_scores.sum(), 1.0)
    loss_cls = _bce(pred_scores, assign.target_scores).sum() / target_scores_sum

    weight = assign.target_scores.sum(-1) * assign.fg_mask  # (B, A)
    loss_ray = polar_ops.mask_iou_loss(
        pred_rays_px, assign.target_rays, weight, target_scores_sum
    )

    box_gain = hyp.box
    cls_gain = hyp.cls
    total = (loss_ray * box_gain + loss_cls * cls_gain) * B
    return LossOut(total, {"seg_loss": loss_ray * box_gain, "cls_loss": loss_cls * cls_gain})


def _df_loss(pred_dist, target, reg_max):
    """Distribution focal loss (reference loss.py:75 _df_loss).

    pred_dist (..., 4, reg_max) logits, target (..., 4) continuous in
    [0, reg_max-1]. Returns (...,) mean over the 4 sides."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    # bin pick as a one-hot multiply-reduce, NOT take_along_axis: an XLA:TPU
    # gather along the minor (reg_max) axis runs on the slow scalar gather
    # path — the two gathers here were the single hottest ops of the whole
    # detect train step (8.7 + 7.9 ms/step of a 46 ms step at b16/640,
    # runs/profile_step_detect_b16.json + runs/step_hlo_detect.txt); the
    # dense form is one fused pass over (..., 4, reg_max)
    bins = jnp.arange(reg_max, dtype=jnp.int32)
    oh_l = (jnp.clip(tl, 0, reg_max - 1)[..., None] == bins).astype(logp.dtype)
    oh_r = (jnp.clip(tr, 0, reg_max - 1)[..., None] == bins).astype(logp.dtype)
    ce_l = -(logp * oh_l).sum(-1)
    ce_r = -(logp * oh_r).sum(-1)
    return (ce_l * wl + ce_r * wr).mean(-1)


def detection_loss(
    feats: Sequence[jnp.ndarray],  # per-level (B, H, W, 4*reg_max+nc)
    batch: Dict[str, jnp.ndarray],  # cls (B,N), bboxes (B,N,4) xywh norm, mask_gt
    strides: Sequence[int],
    nc: int,
    hyp,
    reg_max: int = 16,
    return_assign: bool = False,
) -> LossOut:
    """Stock detect loss (reference oriv8DetectionLoss, loss.py:414).

    ``return_assign=True`` additionally returns the TAL assignment so
    pose/proto-mask losses reuse it instead of re-running the most expensive
    train-step op (the reference shares it the same way inside one class)."""
    B = feats[0].shape[0]
    dt = jnp.float32
    x = flatten_levels(feats).astype(dt)
    pred_dist, pred_scores = x[..., : 4 * reg_max], x[..., 4 * reg_max :]

    feat_hw = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, stride_t = polar_ops.make_anchors(feat_hw, strides, dtype=dt)
    img_h = feat_hw[0][0] * strides[0]
    img_w = feat_hw[0][1] * strides[0]

    scale4 = jnp.asarray([img_w, img_h, img_w, img_h], dt)
    gt_bboxes = xywh2xyxy(batch["bboxes"].astype(dt) * scale4)
    gt_labels = batch["cls"].astype(jnp.int32)
    mask_gt = batch["mask_gt"].astype(bool)

    # DFL expectation decode -> xyxy in grid units
    b, a, _ = pred_dist.shape
    probs = jax.nn.softmax(pred_dist.reshape(b, a, 4, reg_max), axis=-1)
    proj = jnp.arange(reg_max, dtype=dt)
    ltrb = jnp.einsum("bakr,r->bak", probs, proj)
    pred_bboxes = dist2bbox(ltrb, anchor_points[None], xywh=False)  # grid units

    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_t[None]),
        anchor_points * stride_t,
        gt_labels,
        gt_bboxes,
        mask_gt,
        alpha=0.5,
        beta=6.0,
        topk=10,
    )

    target_scores_sum = jnp.maximum(assign.target_scores.sum(), 1.0)
    loss_cls = _bce(pred_scores, assign.target_scores).sum() / target_scores_sum

    fg = assign.fg_mask.astype(dt)  # (B, A)
    weight = assign.target_scores.sum(-1) * fg
    target_bboxes_g = assign.target_bboxes / stride_t[None]  # grid units
    iou = bbox_iou(pred_bboxes, target_bboxes_g, xywh=False, CIoU=True)
    loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum

    target_ltrb = bbox2dist(anchor_points[None], target_bboxes_g, reg_max - 1)
    dfl = _df_loss(pred_dist.reshape(b, a, 4, reg_max), target_ltrb, reg_max)
    loss_dfl = (dfl * weight).sum() / target_scores_sum

    total = (
        loss_iou * hyp.box + loss_cls * hyp.cls + loss_dfl * hyp.dfl
    ) * B
    out = LossOut(
        total,
        {
            "box_loss": loss_iou * hyp.box,
            "cls_loss": loss_cls * hyp.cls,
            "dfl_loss": loss_dfl * hyp.dfl,
        },
    )
    if return_assign:
        return out, assign
    return out


# OKS sigmas for 17 COCO keypoints (reference v8PoseLoss loss.py:1034)
OKS_SIGMA = jnp.asarray(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07, .87, .87, .89, .89]
) / 10.0


def pose_loss(
    feats: Sequence[jnp.ndarray],  # per-level (B,H,W, 4*reg_max+nc+nk)
    batch: Dict[str, jnp.ndarray],  # + keypoints (B,N,17,3) normalized
    strides: Sequence[int],
    nc: int,
    hyp,
    kpt_shape: Tuple[int, int] = (17, 3),
    reg_max: int = 16,
) -> LossOut:
    """Pose loss (reference v8PoseLoss loss.py:1019): detect losses + OKS-style
    keypoint location loss + visibility BCE on assigned anchors."""
    nk = kpt_shape[0] * kpt_shape[1]
    det_feats = [f[..., :-nk] for f in feats]
    # one shared TAL assignment for detect + keypoint targets (the reference's
    # v8PoseLoss computes it once, loss.py:1050)
    det, assign = detection_loss(
        det_feats, batch, strides, nc, hyp, reg_max, return_assign=True
    )

    dt = jnp.float32
    kpt_raw = flatten_levels([f[..., -nk:] for f in feats]).astype(dt)  # (B,A,nk)
    feat_hw = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, stride_t = polar_ops.make_anchors(feat_hw, strides, dtype=dt)
    img_h = feat_hw[0][0] * strides[0]
    img_w = feat_hw[0][1] * strides[0]
    b, a = kpt_raw.shape[0], kpt_raw.shape[1]

    # decoded keypoints in px (reference kpts_decode loss.py:1098)
    k = kpt_raw.reshape(b, a, kpt_shape[0], kpt_shape[1])
    kxy = (k[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]

    gt_kpts = batch["keypoints"].astype(dt)  # (B, N, 17, 3) normalized xy + vis
    gt_kxy = gt_kpts[..., :2] * jnp.asarray([img_w, img_h], dt)
    sel_kxy = jnp.take_along_axis(gt_kxy, assign.target_gt_idx[:, :, None, None], axis=1)
    sel_vis = jnp.take_along_axis(
        gt_kpts[..., 2], assign.target_gt_idx[:, :, None], axis=1
    )  # (B, A, 17)
    kpt_mask = (sel_vis > 0) & assign.fg_mask[..., None]

    area = jnp.prod(
        assign.target_bboxes[..., 2:] - assign.target_bboxes[..., :2], axis=-1
    )[..., None]
    d2 = ((kxy - sel_kxy) ** 2).sum(-1)  # (B, A, K)
    # OKS denominator is (2*sigma)^2 (reference KeypointLoss loss.py:183 and
    # cocoeval), matching kpt_iou in utils/metrics.py. COCO sigmas apply only
    # to the 17-kpt layout; otherwise uniform 1/K (reference v8PoseLoss
    # loss.py:240: sigmas = OKS_SIGMA if is_pose else ones(nkpt)/nkpt).
    sigmas = (
        OKS_SIGMA
        if kpt_shape[0] == OKS_SIGMA.shape[0]
        else jnp.full((kpt_shape[0],), 1.0 / kpt_shape[0], dt)
    )
    e = d2 / ((2 * sigmas[None, None, :]) ** 2) / (area + 1e-9) / 2
    loss_kpt = (
        ((1 - jnp.exp(-e)) * kpt_mask).sum()
        / jnp.maximum(kpt_mask.sum(), 1.0)
    )
    if kpt_shape[1] == 3:
        loss_kobj = (
            (_bce(k[..., 2], kpt_mask.astype(dt)) * assign.fg_mask[..., None]).sum()
            / jnp.maximum(assign.fg_mask.sum() * kpt_shape[0], 1.0)
        )
    else:
        loss_kobj = jnp.zeros((), dt)

    B = feats[0].shape[0]
    total = det.total + (loss_kpt * hyp.pose + loss_kobj * hyp.kobj) * B
    items = dict(det.items)
    items.update({"pose_loss": loss_kpt * hyp.pose, "kobj_loss": loss_kobj * hyp.kobj})
    return LossOut(total, items)


def segmentation_ori_loss(
    outs,  # ([per-level (B,H,W,4*reg_max+nc+nm)], proto (B,hp,wp,nm))
    batch: Dict[str, jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    hyp,
    nm: int = 32,
    reg_max: int = 16,
    max_fg: int = 64,
) -> LossOut:
    """Stock prototype-mask segmentation loss (reference oriv8SegmentationLoss
    loss.py:886-1015): detect losses + per-instance mask BCE of
    (proto @ coeffs) against the GT mask, cropped to the target box and
    normalized by its area.

    TPU-shape discipline: instead of the reference's ragged fg gather, the
    top-`max_fg` assigned anchors per image (by target score) carry the mask
    loss — exact whenever fg count <= max_fg. GT masks come from the 360-pt
    contours rasterized on device at proto resolution."""
    levels, proto = outs
    B = levels[0].shape[0]
    dt = jnp.float32
    det_feats = [o[..., : o.shape[-1] - nm] for o in levels]
    # one shared TAL assignment for detect + mask targets (the reference's
    # oriv8SegmentationLoss computes it once, loss.py:930)
    det, assign = detection_loss(
        det_feats, batch, strides, nc, hyp, reg_max, return_assign=True
    )

    mc = flatten_levels([o[..., -nm:] for o in levels]).astype(dt)  # (B, A, nm)
    feat_hw = [(f.shape[1], f.shape[2]) for f in det_feats]
    img_h = feat_hw[0][0] * strides[0]
    img_w = feat_hw[0][1] * strides[0]

    hp, wp = proto.shape[1], proto.shape[2]
    # GT masks at proto resolution from the 360-pt contours
    from ..ops.raster import fill_polygons

    gt_pts = batch["segments"].astype(dt) * jnp.asarray([wp, hp], dt)
    gmask_valid = jnp.broadcast_to(
        batch["mask_gt"].astype(bool)[..., None], gt_pts.shape[:-1]
    )
    gt_masks = jax.vmap(lambda p, v: fill_polygons(p, v, hp, wp))(
        gt_pts, gmask_valid
    ).astype(dt)  # (B, N, hp, wp)

    # select top-max_fg fg anchors per image
    fg_score = assign.target_scores.sum(-1) * assign.fg_mask  # (B, A)
    K = min(max_fg, fg_score.shape[1])
    topv, topi = jax.lax.top_k(fg_score, K)  # (B, K)
    sel_mc = jnp.take_along_axis(mc, topi[..., None], axis=1)  # (B, K, nm)
    sel_gt_idx = jnp.take_along_axis(assign.target_gt_idx, topi, axis=1)  # (B, K)
    sel_fg = jnp.take_along_axis(assign.fg_mask, topi, axis=1) & (topv > 0)
    sel_boxes = jnp.take_along_axis(assign.target_bboxes, topi[..., None], axis=1)
    sel_gt_masks = jnp.take_along_axis(
        gt_masks, sel_gt_idx[..., None, None], axis=1
    )  # (B, K, hp, wp)

    pred_masks = jnp.einsum("bkm,bhwm->bkhw", sel_mc, proto.astype(dt))
    bce = optax.sigmoid_binary_cross_entropy(pred_masks, sel_gt_masks)

    # crop to target box at proto scale (reference crop_mask ops.py:696)
    bx = sel_boxes * jnp.asarray([wp / img_w, hp / img_h, wp / img_w, hp / img_h], dt)
    py = jnp.arange(hp, dtype=dt)[None, None, :, None]
    px = jnp.arange(wp, dtype=dt)[None, None, None, :]
    inbox = (
        (px >= bx[..., 0, None, None]) & (px < bx[..., 2, None, None])
        & (py >= bx[..., 1, None, None]) & (py < bx[..., 3, None, None])
    )
    area = jnp.clip(
        (bx[..., 2] - bx[..., 0]) * (bx[..., 3] - bx[..., 1]), 1.0, None
    )
    per_inst = (bce * inbox).sum((-2, -1)) / area  # (B, K)
    loss_mask = (per_inst * sel_fg).sum() / jnp.maximum(sel_fg.sum(), 1.0)

    total = det.total + loss_mask * hyp.box * B
    items = dict(det.items)
    items["mask_loss"] = loss_mask * hyp.box
    return LossOut(total, items)


def classification_loss(preds: jnp.ndarray, batch: Dict[str, jnp.ndarray]) -> LossOut:
    """CE summed / 64 (reference v8ClassificationLoss loss.py:1107). The fork's
    Classify head outputs sigmoid probs; CE computed on their log."""
    labels = batch["cls"].astype(jnp.int32).reshape(-1)
    logp = jnp.log(jnp.clip(preds, 1e-7, 1.0))
    logp = logp - jax.scipy.special.logsumexp(logp, axis=-1, keepdims=True)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)
    loss = nll.sum() / 64.0
    return LossOut(loss, {"cls_loss": loss})
