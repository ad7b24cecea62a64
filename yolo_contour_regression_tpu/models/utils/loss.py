"""DETR-family losses — Hungarian matching + per-layer criterion.

Re-implementation of the reference ``models/utils/loss.py`` (DETRLoss /
RTDETRDetectionLoss :295) and ``models/utils/ops.py`` HungarianMatcher:
cost = class-cost + L1 box cost + GIoU cost over (query, gt) pairs; optimal
assignment per image; then varifocal-style class loss + L1 + GIoU box losses,
averaged over decoder layers (aux losses).

TPU note: everything stays on device — including the assignment solve. The
reference (and most DETR ports) ships the cost matrix to host for
scipy.optimize.linear_sum_assignment; on this repo's target deployment the
accelerator sits behind a PJRT tunnel with NO host-callback support
(pure_callback raises UNIMPLEMENTED), and a per-layer host round-trip would
serialize the step anyway. ``hungarian_assign`` is instead a fully in-graph
Jacobi auction (Bertsekas 1988): all unassigned gts bid in parallel each
round (dense (G, Q) tensor work the VPU eats), a ``lax.while_loop`` runs
rounds until every gt holds a query, and a greedy completion pass bounds
worst-case rounds. The assignment is within G·ε of optimal (measured: exact
to ~1e-7 relative vs the scipy oracle, tests/test_rtdetr.py). Contrastive
denoising (reference get_cdn_group, ops.py:260) is implemented fixed-shape in
``models/utils/ops.py`` and consumed here by ``detr_dn_layer_loss``.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.boxes import bbox_iou, xywh2xyxy


_NEG = -1e9


def _auction_one(cost_qg: jnp.ndarray, n_valid: jnp.ndarray,
                 max_rounds: int = 600) -> jnp.ndarray:
    """Jacobi auction for ONE image: cost (Q, G) -> (G,) query per gt, -1 for
    padded gts. Persons = gts (few), objects = queries (many, Q >= G so a
    perfect matching always exists).

    Single phase, fixed ε, zero initial prices — NOT ε-scaling: with Q > G
    the duality gap bound needs every positively-priced object to stay
    assigned, which holds from a cold start (an object that receives a bid is
    owned forever) but breaks across scaling phases (released objects keep
    inflated prices and may never be re-bid, losing optimality entirely).
    With ε = spread/(200·G) the assignment is within spread/200 of optimal;
    measured on uniform/clustered/crowd cost geometries it is exact to ~1e-7
    relative and converges in ≤150 Jacobi rounds (tests/test_rtdetr.py)."""
    Q, G = cost_qg.shape
    value = -cost_qg.T.astype(jnp.float32)  # (G, Q) person benefit
    valid = jnp.arange(G) < n_valid
    v_real = jnp.where(valid[:, None], value, 0.0)
    spread = jnp.maximum(v_real.max() - v_real.min(), 1e-6)
    eps = spread / (200.0 * G)
    arangeG = jnp.arange(G)
    arangeQ = jnp.arange(Q)

    def cond(s):
        prices, p2o, o2p, rounds = s
        unassigned = valid & (p2o < 0)
        return (rounds < max_rounds) & unassigned.any()

    def body(s):
        prices, p2o, o2p, rounds = s
        bidders = valid & (p2o < 0)
        # parallel bidding: each unassigned person bids best-vs-second margin
        net = value - prices[None, :]                       # (G, Q)
        i1 = jnp.argmax(net, axis=1)
        b1 = jnp.take_along_axis(net, i1[:, None], 1)[:, 0]
        b2 = jnp.max(net.at[arangeG, i1].set(_NEG), axis=1)
        bid = prices[i1] + (b1 - b2) + eps
        bid = jnp.where(bidders, bid, _NEG)
        # object-wise winner (a person bids one object, so winners are unique)
        bids_mx = jnp.where(arangeQ[None, :] == i1[:, None], bid[:, None], _NEG)
        obj_bid = bids_mx.max(axis=0)                       # (Q,)
        obj_winner = jnp.argmax(bids_mx, axis=0)            # (Q,)
        won = obj_bid > _NEG
        # evict previous owners of re-priced objects
        lost = jnp.zeros((G,), bool).at[jnp.clip(o2p, 0)].max(won & (o2p >= 0))
        p2o = jnp.where(lost, -1, p2o)
        o2p = jnp.where(won, obj_winner, o2p)
        p2o = p2o.at[jnp.where(won, obj_winner, G)].set(arangeQ, mode="drop")
        prices = jnp.where(won, obj_bid, prices)
        return prices, p2o, o2p, rounds + 1

    init = (
        jnp.zeros((Q,), jnp.float32),
        jnp.full((G,), -1, jnp.int32),
        jnp.full((Q,), -1, jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    _, p2o, o2p, _ = jax.lax.while_loop(cond, body, init)

    # greedy completion: if the round cap hit first, hand any still-unassigned
    # valid gt its best free query (keeps the matching feasible)
    def fill(g, carry):
        p2o, o2p = carry
        need = valid[g] & (p2o[g] < 0)
        o = jnp.argmax(jnp.where(o2p < 0, value[g], _NEG))
        p2o = p2o.at[g].set(jnp.where(need, o, p2o[g]))
        o2p = o2p.at[o].set(jnp.where(need, g, o2p[o]))
        return p2o, o2p

    p2o, _ = jax.lax.fori_loop(0, G, fill, (p2o, o2p))
    return jnp.where(valid, p2o, -1).astype(jnp.int32)


def hungarian_assign(cost: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """cost (N, Q, G), n_valid (N,) -> assignment (N, G) query index per gt
    (-1 for padded gts). Fully in-graph (see module docstring); under vmap
    the while_loop runs until the slowest image in the batch converges."""
    return jax.vmap(_auction_one)(cost, n_valid)


def match_cost(
    pred_boxes, pred_logits, gt_boxes, gt_labels, mask_gt,
    cost_class: float = 2.0, cost_bbox: float = 5.0, cost_giou: float = 2.0,
    alpha: float = 0.25, gamma: float = 2.0,
):
    """(B, Q, 4)cxcywh-norm, (B, Q, nc), (B, G, 4), (B, G), (B, G) ->
    cost (B, Q, G). Focal-style class cost (reference HungarianMatcher)."""
    prob = jax.nn.sigmoid(pred_logits)  # (B, Q, nc)
    sel = jnp.take_along_axis(
        prob, jnp.clip(gt_labels, 0, prob.shape[-1] - 1)[:, None, :], axis=2
    )  # (B, Q, G)
    pos_cost = alpha * ((1 - sel) ** gamma) * (-jnp.log(sel + 1e-8))
    neg_cost = (1 - alpha) * (sel**gamma) * (-jnp.log(1 - sel + 1e-8))
    c_class = pos_cost - neg_cost
    c_l1 = jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]).sum(-1)
    giou = bbox_iou(
        xywh2xyxy(pred_boxes)[:, :, None, :], xywh2xyxy(gt_boxes)[:, None, :, :],
        xywh=False, GIoU=True,
    )
    cost = cost_class * c_class + cost_bbox * c_l1 + cost_giou * (1.0 - giou)
    big = 1e6
    return jnp.where(mask_gt[:, None, :], cost, big)


def detr_layer_loss(
    pred_boxes, pred_logits, gt_boxes, gt_labels, mask_gt, assign,
    nc: int, alpha: float = 0.75, gamma: float = 2.0,
):
    """One decoder layer's losses given the (B, G) gt->query assignment."""
    B, Q, _ = pred_logits.shape
    n_gt = jnp.maximum(mask_gt.sum(), 1.0)

    # scatter gt classes onto assigned queries; padded gts scatter to the
    # out-of-range index Q and are dropped (a clip-to-0 scheme lets a padded
    # gt overwrite a real assignment that landed on query 0)
    assign_safe = jnp.clip(assign, 0, Q - 1)
    drop_idx = jnp.where(mask_gt, assign_safe, Q)
    onehot_q = jnp.zeros((B, Q), jnp.int32).at[
        jnp.arange(B)[:, None], assign_safe
    ].add(mask_gt.astype(jnp.int32))
    tgt_cls = jnp.full((B, Q), nc, jnp.int32).at[
        jnp.arange(B)[:, None], drop_idx
    ].set(gt_labels, mode="drop")

    # IoU-aware targets (VFL-style, reference DETRLoss._get_loss_class)
    matched_boxes = jnp.take_along_axis(
        pred_boxes, assign_safe[..., None], axis=1
    )  # (B, G, 4)
    iou_g = bbox_iou(xywh2xyxy(matched_boxes), xywh2xyxy(gt_boxes), xywh=False)
    iou_q = jnp.zeros((B, Q)).at[jnp.arange(B)[:, None], assign_safe].add(
        jnp.where(mask_gt, jnp.clip(iou_g, 0, 1), 0.0)
    )
    onehot = jax.nn.one_hot(tgt_cls, nc)
    t_score = onehot * iou_q[..., None]
    prob = jax.nn.sigmoid(pred_logits)
    # varifocal loss (reference utils/loss.py:22 VarifocalLoss.forward):
    # weight = alpha*p^gamma on the LABEL one-hot's complement (alpha=0.75),
    # gt_score on the label slot — a matched query with IoU 0 gets weight 0
    # there, not a background penalty
    weight = alpha * (prob**gamma) * (1 - onehot) + t_score * onehot
    bce = -(
        t_score * jnp.log(prob + 1e-8) + (1 - t_score) * jnp.log(1 - prob + 1e-8)
    )
    loss_cls = (bce * weight).sum() / n_gt

    gb = jnp.where(mask_gt[..., None], gt_boxes, 0.0)
    mb = jnp.where(mask_gt[..., None], matched_boxes, 0.0)
    loss_l1 = jnp.abs(mb - gb).sum() / n_gt
    giou = bbox_iou(xywh2xyxy(matched_boxes), xywh2xyxy(gt_boxes), xywh=False, GIoU=True)
    loss_giou = (jnp.where(mask_gt, 1.0 - giou, 0.0)).sum() / n_gt
    return loss_cls, loss_l1, loss_giou


def detr_dn_layer_loss(
    pb, pl, gt_boxes, gt_labels, mask_gt, nc: int,
    alpha: float = 0.75, gamma: float = 2.0,
):
    """Denoising losses for one layer with the KNOWN dn->gt assignment
    (reference get_dn_match_indices, models/utils/ops.py:236): dn query
    (group g, positive slot, gt n) is matched to gt n; the negative slot is
    background. pb (B, G, 2, N, 4), pl (B, G, 2, N, nc)."""
    B, G, _, N, _ = pb.shape
    n_gt = jnp.maximum(mask_gt.sum() * G, 1.0)
    gt_b = jnp.broadcast_to(gt_boxes[:, None], (B, G, N, 4))
    gt_c = jnp.broadcast_to(gt_labels[:, None], (B, G, N))
    m = jnp.broadcast_to(mask_gt[:, None], (B, G, N))

    pos_b, pos_l = pb[:, :, 0], pl[:, :, 0]
    neg_l = pl[:, :, 1]
    iou = jnp.clip(bbox_iou(xywh2xyxy(pos_b), xywh2xyxy(gt_b), xywh=False), 0, 1)
    onehot_pos = jax.nn.one_hot(gt_c, nc) * m[..., None]
    t_pos = onehot_pos * iou[..., None]

    def vfl(logits, t, onehot):
        # reference VarifocalLoss (utils/loss.py:22): alpha=0.75 on the
        # label complement, the IoU score on the label slot
        prob = jax.nn.sigmoid(logits)
        weight = alpha * (prob**gamma) * (1 - onehot) + t * onehot
        bce = -(t * jnp.log(prob + 1e-8) + (1 - t) * jnp.log(1 - prob + 1e-8))
        return (bce * weight).sum()

    loss_cls = (
        vfl(pos_l, t_pos, onehot_pos)
        + vfl(neg_l, jnp.zeros_like(t_pos), jnp.zeros_like(onehot_pos))
    ) / n_gt
    loss_l1 = (jnp.abs(pos_b - gt_b).sum(-1) * m).sum() / n_gt
    giou = bbox_iou(xywh2xyxy(pos_b), xywh2xyxy(gt_b), xywh=False, GIoU=True)
    loss_giou = ((1.0 - giou) * m).sum() / n_gt
    return loss_cls, loss_l1, loss_giou


def rtdetr_loss(
    outs: Tuple,
    batch: Dict[str, jnp.ndarray],
    nc: int,
    dn: Dict[str, jnp.ndarray] = None,
    gain_class: float = 1.0,
    gain_bbox: float = 5.0,
    gain_giou: float = 2.0,
):
    """Full RT-DETR criterion over all decoder layers + encoder proposals
    (reference RTDETRDetectionLoss.__call__), plus the contrastive-denoising
    losses when ``dn`` (the get_cdn_group dict) is given — the decoder's
    leading dn_q = G*2*N queries are the dn groups, the rest are matching
    queries. batch boxes are normalized cxcywh. Returns (total, items)."""
    dec_bboxes, dec_scores, enc_bboxes, enc_scores = outs
    gt_boxes = batch["bboxes"].astype(jnp.float32)
    gt_labels = batch["cls"].astype(jnp.int32)
    mask_gt = batch["mask_gt"].astype(bool)

    dn_q = 0
    if dn is not None:
        _, G, two, N = dn["labels"].shape
        dn_q = G * two * N

    def one(pb, pl):
        cost = match_cost(
            jax.lax.stop_gradient(pb), jax.lax.stop_gradient(pl),
            gt_boxes, gt_labels, mask_gt,
        )
        assign = hungarian_assign(cost, mask_gt.sum(-1))
        return detr_layer_loss(pb, pl, gt_boxes, gt_labels, mask_gt, assign, nc)

    totals = {"cls_loss": 0.0, "l1_loss": 0.0, "giou_loss": 0.0}
    dn_totals = {"dn_cls_loss": 0.0, "dn_l1_loss": 0.0, "dn_giou_loss": 0.0}
    L = dec_bboxes.shape[0]
    for i in range(L):
        lc, l1, lg = one(dec_bboxes[i][:, dn_q:], dec_scores[i][:, dn_q:])
        totals["cls_loss"] += lc
        totals["l1_loss"] += l1
        totals["giou_loss"] += lg
        if dn_q:
            B = dec_bboxes.shape[1]
            pb = dec_bboxes[i][:, :dn_q].reshape(B, G, two, N, 4)
            pl = dec_scores[i][:, :dn_q].reshape(B, G, two, N, nc)
            dc, d1, dg = detr_dn_layer_loss(pb, pl, gt_boxes, gt_labels, mask_gt, nc)
            dn_totals["dn_cls_loss"] += dc
            dn_totals["dn_l1_loss"] += d1
            dn_totals["dn_giou_loss"] += dg
    lc, l1, lg = one(enc_bboxes, enc_scores)
    totals["cls_loss"] += lc
    totals["l1_loss"] += l1
    totals["giou_loss"] += lg

    # reference DETRLoss sums every aux layer's loss at FULL gain (no 1/L
    # normalization: _get_aux_loss adds each layer's weighted loss to the
    # total) — the previous /n_layers here shrank gradients ~7x and was the
    # main reason the overfit-8 diagnostic could not converge
    items = {
        "cls_loss": totals["cls_loss"] * gain_class,
        "l1_loss": totals["l1_loss"] * gain_bbox,
        "giou_loss": totals["giou_loss"] * gain_giou,
    }
    if dn_q:
        items.update(
            {
                "dn_cls_loss": dn_totals["dn_cls_loss"] * gain_class,
                "dn_l1_loss": dn_totals["dn_l1_loss"] * gain_bbox,
                "dn_giou_loss": dn_totals["dn_giou_loss"] * gain_giou,
            }
        )
    total = sum(items.values())
    return total, items
