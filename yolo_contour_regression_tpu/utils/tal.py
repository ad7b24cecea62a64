"""Task-aligned assignment — polar and stock — as fixed-shape jit-able fns.

TPU-native re-implementation of the reference assigners:
  - ``polar_task_aligned_assign``: the canonical "polarpaper" polar TAL
    (reference tal.py:1109-1390): candidate anchors inside the GT box, GT rays
    per (gt, anchor) via 360-point angle binning, overlaps = polar MaskIoU,
    align = score^alpha * iou^beta, top-10 per GT, dedupe per anchor by max
    overlap, normalized target scores.
  - ``task_aligned_assign``: the stock v8 TAL (reference tal.py:252
    oriTaskAlignedAssigner) with CIoU overlaps, used by detect/pose/segori.

Design (NOT a port): the reference gathers ragged ``[mask_gt]`` index sets and
loops scatter ops; here every tensor is statically shaped. The polar metric is
computed only for a static top-``cand`` candidate set per GT (exact whenever
the in-box anchor count fits the cap — candidates are ranked in-box-first,
then by the predicted class score, so the cap degrades gracefully for huge
objects). Results are scattered back to dense (B, A) target maps, which is
what the loss wants anyway.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import polar as polar_ops
from ..ops.boxes import bbox_iou

EPS = 1e-9
INF = 1e9


def resolve_cand(cand, A: int, n_pad=None, balance: bool = True) -> int:
    """Resolve the assigner candidate cap. ``cand`` None/0/'auto' scales with
    the anchor count (A//16, floored at 128, capped at 512) so image-filling
    objects at large imgsz keep enough candidates — the reference computes
    the polar metric on ALL in-box anchors (tal.py:1134-1204); the cap is
    the static-shape approximation, quantified in
    tests/test_assigner_loss.py::test_cand_cap_vs_exact_assignment_big_objects.
    Block-skipping in the GT-ray kernel (ops/pallas_polar.py v3) makes the
    larger cap nearly free when objects are small."""
    if cand in (None, 0, "auto"):
        # exactness-leaning: scales with anchor count for image-filling
        # objects at large imgsz (~4x the default budget at 640px)
        base = min(A, max(128, min(A // 16, 512)))
    else:
        base = min(int(cand), A)
    if n_pad is not None and balance:
        base = balance_cand(base, n_pad)
    return base


def balance_cand(base: int, n_pad: int, floor: int = 48) -> int:
    """Work-balanced candidate budget (VERDICT r2 next-#3): the GT-ray cost
    is ~ N_pad x K pairs, so crowded buckets (N_pad 32/48) trade per-GT
    candidate breadth for bounded total work — K ~ base * 8 / N_pad, floored.
    Crowded real images have small objects (few in-box anchors each), so the
    narrower per-GT cap stays exact for them; the approximation only binds
    for many LARGE overlapping objects (quantified in
    tests/test_assigner_loss.py)."""
    if n_pad <= 8:
        return base
    return max(floor, min(base, (base * 8) // n_pad))


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (B, A) int32
    target_bboxes: jnp.ndarray  # (B, A, 4) xyxy (same units as gt_bboxes)
    target_scores: jnp.ndarray  # (B, A, nc) normalized soft targets
    fg_mask: jnp.ndarray  # (B, A) bool
    target_gt_idx: jnp.ndarray  # (B, A) int32
    target_rays: jnp.ndarray  # (B, A, 36) GT ray distances (polar only; zeros otherwise)
    centerness: jnp.ndarray  # (B, A) polar centerness of GT rays (polar only)


def select_candidates_in_gts(anc_points, gt_bboxes, eps=EPS):
    """(A, 2), (B, N, 4) -> (B, N, A) bool: anchor center strictly inside box
    (reference tal.py select_candidates_in_gts)."""
    x, y = anc_points[:, 0], anc_points[:, 1]
    lt_x = x[None, None, :] - gt_bboxes[..., 0:1]
    lt_y = y[None, None, :] - gt_bboxes[..., 1:2]
    rb_x = gt_bboxes[..., 2:3] - x[None, None, :]
    rb_y = gt_bboxes[..., 3:4] - y[None, None, :]
    return (
        jnp.minimum(jnp.minimum(lt_x, lt_y), jnp.minimum(rb_x, rb_y)) > eps
    )


def _topk_mask(metrics, topk, valid):
    """(..., K) metric -> (..., K) bool mask of the top-`topk` entries,
    restricted to `valid` (reference select_topk_candidates: indices are taken
    by metric rank regardless of value, then invalid GTs zeroed)."""
    gated = jnp.where(valid, metrics, -INF)
    kth = jax.lax.top_k(gated, topk)[0][..., -1:]
    mask = (gated >= kth) & valid
    # guard against ties producing > topk entries: keep ranked-first ones
    ranked = jnp.cumsum(mask, axis=-1)
    return mask & (ranked <= topk)


def _dedupe_by_overlap(mask_pos, overlaps, n_max):
    """Resolve anchors claimed by multiple GTs: keep max-overlap GT
    (reference tal.py select_highest_overlaps)."""
    fg_count = mask_pos.sum(1)  # (B, A)
    gated = jnp.where(mask_pos > 0, overlaps, -INF)
    best_gt = gated.argmax(1)  # (B, A)
    onehot = jax.nn.one_hot(best_gt, n_max, dtype=mask_pos.dtype, axis=1)
    mask_final = jnp.where((fg_count > 1)[:, None, :], onehot, mask_pos)
    fg_mask = mask_final.sum(1) > 0
    target_gt_idx = mask_final.argmax(1)
    return target_gt_idx, fg_mask, mask_final


def _normalized_target_scores(
    gt_labels, target_gt_idx, fg_mask, align_dense, overlaps_dense, mask_final, nc
):
    """One-hot targets scaled by the per-GT normalized align metric
    (reference tal.py:1199-1208)."""
    target_labels = jnp.take_along_axis(
        gt_labels, target_gt_idx, axis=1
    )  # (B, A)
    target_labels = jnp.clip(target_labels, 0, None)
    onehot = jax.nn.one_hot(target_labels, nc, dtype=align_dense.dtype)
    onehot = onehot * fg_mask[..., None]

    align_pos = align_dense * mask_final  # (B, N, A)
    pos_align_max = align_pos.max(-1, keepdims=True)  # (B, N, 1)
    pos_overlap_max = (overlaps_dense * mask_final).max(-1, keepdims=True)
    norm = (align_pos * pos_overlap_max / (pos_align_max + EPS)).max(1)  # (B, A)
    return target_labels, onehot * norm[..., None]


@partial(
    jax.jit,
    static_argnames=("topk", "cand", "chunk", "impl"),
)
def polar_task_aligned_assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) sigmoid scores
    pd_rays: jnp.ndarray,  # (B, A, 36) pred ray distances, px
    anc_points: jnp.ndarray,  # (A, 2) anchor centers, px
    gt_labels: jnp.ndarray,  # (B, N) int32
    gt_bboxes: jnp.ndarray,  # (B, N, 4) xyxy px
    gt_contours: jnp.ndarray,  # (B, N, 360, 2) px
    mask_gt: jnp.ndarray,  # (B, N) bool
    alpha: float = 0.5,
    beta: float = 4.0,
    topk: int = 10,
    cand: int = 128,
    chunk: int = 4096,
    impl: str = "sparse",
) -> AssignResult:
    B, A, nc = pd_scores.shape
    N = gt_labels.shape[1]
    K = min(cand, A)
    dt = pd_scores.dtype

    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)  # (B, N, A)
    valid_pair = mask_in_gts & mask_gt[..., None]

    # --- candidate selection: all in-box anchors first, score as tiebreak ---
    score_gt = jnp.take_along_axis(
        jnp.transpose(pd_scores, (0, 2, 1)),  # (B, nc, A)
        jnp.clip(gt_labels, 0, nc - 1)[:, :, None],
        axis=1,
    )  # (B, N, A)
    cand_key = valid_pair.astype(dt) * (1.0 + score_gt)
    _, cand_idx = jax.lax.top_k(cand_key, K)  # (B, N, K)

    gather = lambda x: jnp.take_along_axis(x, cand_idx, axis=2)
    valid_cand = gather(valid_pair)
    score_cand = gather(score_gt)
    anc_cand = anc_points[cand_idx]  # (B, N, K, 2)
    rays_cand = jnp.take_along_axis(
        jnp.broadcast_to(pd_rays[:, None], (B, N, A, pd_rays.shape[-1])),
        cand_idx[..., None],
        axis=2,
    )  # (B, N, K, 36)

    # --- GT rays per candidate pair (the hot loop) --------------------------
    # row-shared form: the K candidates of one GT share its contour, so the
    # kernel fetches each contour once (not K broadcast copies), and the
    # in-box-first candidate ranking makes `valid_cand` a per-row PREFIX —
    # all-padding 8-pair blocks skip compute entirely (ops/pallas_polar.py v3)
    from ..ops.pallas_polar import gt_rays_rows_fast

    gt_rays_cand = gt_rays_rows_fast(
        gt_contours.reshape(B * N, polar_ops.NUM_CONTOUR_POINTS, 2),
        anc_cand.reshape(B * N, K, 2),
        valid_cand.reshape(B * N, K),
        chunk=chunk,
    ).reshape(B, N, K, polar_ops.NUM_RAYS)

    overlaps_cand = polar_ops.polar_mask_iou(gt_rays_cand, rays_cand) * valid_cand
    align_cand = (
        jnp.power(jnp.clip(score_cand, 0, None), alpha)
        * jnp.power(jnp.clip(overlaps_cand, 0, None), beta)
    )

    # --- top-k per GT among candidates --------------------------------------
    mask_topk = _topk_mask(align_cand, topk, mask_gt[..., None] & (cand_key.max(-1, keepdims=True) >= 0))
    mask_pos_cand = (mask_topk & valid_cand).astype(dt)

    b_ix = jnp.arange(B)[:, None, None]
    if impl == "dense":
        # reference formulation: scatter candidate results to dense (B, N, A)
        # maps, then dedupe/normalize there (reference tal.py
        # select_highest_overlaps works dense). Kept for the equivalence test;
        # ~8 (B, N, A) f32 intermediates make it the slow path.
        n_ix = jnp.arange(N)[None, :, None]
        zeros = jnp.zeros((B, N, A), dt)
        overlaps_dense = zeros.at[b_ix, n_ix, cand_idx].max(overlaps_cand)
        align_dense = zeros.at[b_ix, n_ix, cand_idx].max(align_cand)
        mask_pos_dense = zeros.at[b_ix, n_ix, cand_idx].max(mask_pos_cand)
        target_gt_idx, fg_mask, mask_final = _dedupe_by_overlap(
            mask_pos_dense, overlaps_dense, N
        )
        mask_cand_final = (
            jnp.take_along_axis(mask_final, cand_idx, axis=2) * mask_pos_cand
        )
        target_labels, target_scores = _normalized_target_scores(
            gt_labels, target_gt_idx, fg_mask, align_dense, overlaps_dense,
            mask_final, nc,
        )
    else:
        # candidate-space dedupe: each (gt, anchor) pair lives at exactly one
        # (b, n, k) slot (top_k indices are distinct per row), so the dense
        # maps are redundant — resolve the per-anchor winner with (B, A)
        # scatter-maxes over the B*N*K updates instead of materializing
        # (B, N, A). Semantics identical to _dedupe_by_overlap +
        # _normalized_target_scores: winner = claiming GT with max overlap,
        # ties -> lowest GT index (jnp.argmax first-occurrence order).
        claim = mask_pos_cand > 0  # (B, N, K)
        n_col = jnp.broadcast_to(jnp.arange(N)[None, :, None], claim.shape)
        gather_a = lambda d: jnp.take_along_axis(  # (B, A) -> (B, N, K)
            d[:, None, :], cand_idx.reshape(B, 1, N * K), axis=2
        ).reshape(B, N, K)  # works for float and int payloads alike

        best_ov = jnp.zeros((B, A), dt).at[b_ix, cand_idx].max(
            jnp.where(claim, overlaps_cand, 0.0)
        )
        fg_mask = best_ov > 0
        # scatter passes values through unchanged -> float equality is exact
        is_best = claim & (overlaps_cand >= gather_a(best_ov))
        best_n = jnp.full((B, A), N, jnp.int32).at[b_ix, cand_idx].min(
            jnp.where(is_best, n_col, N)
        )
        winner = (is_best & (n_col == gather_a(best_n))).astype(dt)
        target_gt_idx = jnp.where(fg_mask, best_n, 0)

        # per-GT normalizers over that GT's WINNING anchors (reference
        # tal.py:1199-1208), then one scatter-max lands the per-anchor score
        row_al_max = (align_cand * winner).max(-1)  # (B, N)
        row_ov_max = (overlaps_cand * winner).max(-1)
        norm_val = align_cand * winner * (
            row_ov_max / (row_al_max + EPS)
        )[..., None]
        norm = jnp.zeros((B, A), dt).at[b_ix, cand_idx].max(norm_val)

        target_labels = jnp.clip(
            jnp.take_along_axis(gt_labels, target_gt_idx, axis=1), 0, None
        )
        onehot = jax.nn.one_hot(target_labels, nc, dtype=dt) * fg_mask[..., None]
        target_scores = onehot * norm[..., None]
        mask_cand_final = winner

    # --- per-anchor targets --------------------------------------------------
    # scatter-add GT rays of the surviving (gt, anchor) pairs; dedupe ensures
    # <=1 contributing pair per anchor so add == select
    ray_zeros = jnp.zeros((B, A, polar_ops.NUM_RAYS), dt)
    target_rays = ray_zeros.at[b_ix, cand_idx].add(
        gt_rays_cand * mask_cand_final[..., None]
    )
    centerness = polar_ops.polar_centerness(jnp.clip(target_rays, polar_ops.RAY_EPS, None))
    centerness = jnp.where(fg_mask, centerness, 0.0)

    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[..., None], axis=1
    )
    return AssignResult(
        target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx,
        target_rays, centerness,
    )


@partial(jax.jit, static_argnames=("topk",))
def task_aligned_assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) sigmoid scores
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy px
    anc_points: jnp.ndarray,  # (A, 2) px
    gt_labels: jnp.ndarray,  # (B, N)
    gt_bboxes: jnp.ndarray,  # (B, N, 4) xyxy px
    mask_gt: jnp.ndarray,  # (B, N) bool
    alpha: float = 0.5,
    beta: float = 6.0,
    topk: int = 10,
) -> AssignResult:
    """Stock v8 TAL (reference tal.py:252): overlaps = CIoU(gt, pred), dense."""
    B, A, nc = pd_scores.shape
    N = gt_labels.shape[1]
    dt = pd_scores.dtype

    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)
    valid_pair = mask_in_gts & mask_gt[..., None]

    score_gt = jnp.take_along_axis(
        jnp.transpose(pd_scores, (0, 2, 1)),
        jnp.clip(gt_labels, 0, nc - 1)[:, :, None],
        axis=1,
    )
    overlaps = bbox_iou(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True
    )
    overlaps = jnp.clip(overlaps, 0, None) * valid_pair
    align = jnp.power(jnp.clip(score_gt, 0, None), alpha) * jnp.power(overlaps, beta)
    align = align * valid_pair

    mask_topk = _topk_mask(align, topk, mask_gt[..., None])
    mask_pos = (mask_topk & valid_pair).astype(dt)

    target_gt_idx, fg_mask, mask_final = _dedupe_by_overlap(mask_pos, overlaps, N)
    target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)
    target_labels, target_scores = _normalized_target_scores(
        gt_labels, target_gt_idx, fg_mask, align, overlaps, mask_final, nc
    )
    zeros_r = jnp.zeros((B, A, polar_ops.NUM_RAYS), dt)
    return AssignResult(
        target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx,
        zeros_r, jnp.zeros((B, A), dt),
    )
