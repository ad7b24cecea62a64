"""On-device, fixed-shape, batched NMS.

TPU-native replacement for the reference's per-image Python-loop NMS
(``ultralytics/utils/ops.py:285-426 non_max_suppression``): instead of dynamic
candidate counts + torchvision.ops.nms, we run a static pipeline entirely under
jit:

  1. per-anchor best class (max / argmax over nc)
  2. confidence gate -> scores below `conf_thres` get -1 so they sort last
  3. top-`pre_nms` candidate pre-selection (static K)
  4. class-offset boxes (multi-class NMS via the max-wh coordinate trick,
     same as the reference ops.py:385 `c = x[:, 5:6] * max_wh`)
  5. greedy suppression over the (K, K) IoU matrix with a fori_loop scan
  6. top-`max_det` surviving detections returned, padded, with a valid mask

Semantics match the reference: IoU threshold default 0.7, conf 0.25 predict /
0.001 val, max_det 300, agnostic optional. Extra columns (the 108 polar contour
values) are carried through untouched, like the reference's mask slot.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import box_iou

MAX_WH = 7680.0  # class-offset magnitude (reference ops.py:336 max_wh)


@partial(
    jax.jit,
    static_argnames=("pre_nms", "max_det", "agnostic"),
)
def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    extras: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    pre_nms: int = 1024,
    max_det: int = 300,
    agnostic: bool = False,
):
    """Single-image fixed-shape NMS. vmap over batch via `non_max_suppression`.

    boxes (A, 4) xyxy, scores (A,), classes (A,) int, extras (A, E).
    Returns dict of padded outputs of length max_det + `valid` mask.
    """
    A = boxes.shape[0]
    k = min(pre_nms, A)
    gated = jnp.where(scores > conf_thres, scores, -1.0)
    top_scores, order = jax.lax.top_k(gated, k)  # (k,) descending
    top_scores = top_scores.astype(jnp.float32)
    # promote the k candidates to f32 here: bf16 inputs are fine upstream
    # (full-tensor precision), but the MAX_WH class offset would eat the
    # coordinate mantissa in bf16 and the IoU matrix needs full precision
    cand_boxes = boxes[order].astype(jnp.float32)
    cand_cls = classes[order]
    cand_alive = top_scores > 0

    offset = jnp.where(
        cand_alive, cand_cls.astype(jnp.float32), -1.0
    ) * (0.0 if agnostic else MAX_WH)
    shifted = cand_boxes + offset[:, None]
    iou = box_iou(shifted, shifted)  # (k, k)

    # Exact greedy NMS solved by fixpoint iteration instead of a k-step serial
    # scan: box i survives iff no higher-ranked SURVIVOR overlaps it. Iterating
    # keep <- alive & ~(Tri∘(iou>t) @ keep) stabilizes the first d dependency
    # levels after d sweeps (d = suppression-chain depth, typically < 10), and
    # the while_loop exits at the unique fixpoint == the sequential result.
    # Each sweep is one (k, k) masked matvec -> MXU work, not a scalar loop.
    rank = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)  # row = suppressor
    # sup_mat[j, i]: higher-ranked j can suppress i. Stored int8 (values are
    # 0/1 and the matvec result is only compared > 0, with int32 MXU
    # accumulation — bit-exact): the (k, k) matrix is re-read from HBM every
    # sweep, and at val shapes (B=128, k=1024) int8 is 134 MB of traffic per
    # sweep instead of f32's 537 MB.
    sup_mat = (
        (iou > iou_thres) & (rank < jax.lax.broadcasted_iota(jnp.int32, (k, k), 1))
    ).astype(jnp.int8)

    def cond(carry):
        keep, prev, it = carry
        return (it < k) & jnp.any(keep != prev)

    def body(carry):
        keep, _, it = carry
        hits = jax.lax.dot_general(
            keep.astype(jnp.int8), sup_mat,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (cand_alive & (hits == 0), keep, it + 1)

    keep, _, _ = jax.lax.while_loop(
        cond, body, (cand_alive, ~cand_alive, jnp.zeros((), jnp.int32))
    )

    final_scores = jnp.where(keep, top_scores, -1.0)
    out_scores, sel = jax.lax.top_k(final_scores, min(max_det, k))
    valid = out_scores > 0
    pick = order[sel]
    out = {
        "boxes": jnp.where(valid[:, None], boxes[pick].astype(jnp.float32), 0),
        "scores": jnp.where(valid, out_scores, 0),
        "classes": jnp.where(valid, classes[pick], -1),
        "extras": jnp.where(valid[:, None], extras[pick], 0),
        "valid": valid,
    }
    if max_det > k:  # pad up (rare: tiny inputs)
        pad = max_det - k
        out = {
            n: jnp.pad(v, ((0, pad),) + ((0, 0),) * (v.ndim - 1)) for n, v in out.items()
        }
        out["classes"] = out["classes"].at[k:].set(-1)
    return out


@partial(
    jax.jit,
    static_argnames=("nc", "pre_nms", "max_det", "agnostic", "multi_label"),
)
def non_max_suppression(
    prediction: jnp.ndarray,
    nc: int,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    pre_nms: int = 1024,
    max_det: int = 300,
    agnostic: bool = False,
    multi_label: bool = False,
):
    """Batched NMS over raw head output.

    prediction: (B, 4 + nc + E, A) — the polar eval head layout
    (head.py:494 allpred: xyxy box, nc sigmoid scores, E=108 contour extras).
    Note the polar head already emits xyxy (the reference removed xywh2xyxy at
    ops.py:363); we keep that contract.

    ``multi_label``: every (anchor, class) pair above ``conf_thres`` becomes
    a candidate — the reference's VAL-mode semantics (ops.py:357,385
    ``multi_label=True`` at val, best-class at predict). Implemented with
    static shapes: top-``pre_nms`` over the flattened (A*nc,) score matrix,
    then gather boxes/extras by anchor index.

    Returns dict of (B, max_det, ...) arrays + valid mask (B, max_det).
    """
    pred = jnp.transpose(prediction, (0, 2, 1))  # (B, A, C)
    return non_max_suppression_parts(
        pred[..., :4], pred[..., 4 : 4 + nc], pred[..., 4 + nc :],
        conf_thres=conf_thres, iou_thres=iou_thres, pre_nms=pre_nms,
        max_det=max_det, agnostic=agnostic, multi_label=multi_label,
    )


@partial(
    jax.jit,
    static_argnames=("pre_nms", "max_det", "agnostic", "multi_label",
                     "scores_are_logits"),
)
def non_max_suppression_parts(
    boxes: jnp.ndarray,
    cls_scores: jnp.ndarray,
    extras: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    pre_nms: int = 1024,
    max_det: int = 300,
    agnostic: bool = False,
    multi_label: bool = False,
    scores_are_logits: bool = False,
):
    """NMS over unconcatenated (B, A, .) components — the hot deploy path.

    ``non_max_suppression`` takes the reference's (B, 4+nc+E, A) tensor,
    which forces the decode to concat + transpose ~250 MB at batch 128 only
    for this function to immediately transpose and re-split it. Feeding
    boxes (B, A, 4) / cls_scores (B, A, nc) / extras (B, A, E) directly
    skips both giant HBM passes (runs/bench_ablate.json r4: decode+NMS were
    40% of pipeline time). bf16 inputs are fine: candidate boxes are
    promoted to f32 before the IoU matrix, outputs are f32.

    ``scores_are_logits``: cls_scores are raw head logits; the sigmoid is
    applied AFTER the per-anchor max / top-k reduction, on (B, A) or (B, k)
    instead of (B, A, nc). Sigmoid is strictly monotonic, so the
    max/argmax/top-k selection and the conf gate (taken at
    logit(conf_thres)) make the same decisions — only ~nc x less normalize
    traffic. One caveat: logits beyond ~16.6 all saturate to probability
    1.0 in f32, so when MORE than pre_nms candidates tie at 1.0 the two
    paths can tie-break the cut differently (the logits path ranks the ties
    by true logit — strictly more informative). This lets the decode skip
    materializing the full sigmoid scores tensor (172 MB at batch 128 /
    nc 80).
    """
    nc = cls_scores.shape[-1]
    if scores_are_logits:
        # strict > gate at the exactly-mapped threshold; conf <= 0 passes
        # all (conf_thres may be traced, so the guard is jnp.where)
        c = jnp.asarray(conf_thres, jnp.float32)
        safe = jnp.clip(c, 1e-12, 1.0 - 1e-7)
        logit_thr = jnp.where(c > 0, jnp.log(safe) - jnp.log1p(-safe), -jnp.inf)
    if multi_label and nc > 1:
        B, A = cls_scores.shape[:2]
        k = min(pre_nms, A * nc)
        flat = cls_scores.reshape(B, A * nc)
        if scores_are_logits:
            gated = jnp.where(flat > logit_thr, flat, -jnp.inf)
            scores, idx = jax.lax.top_k(gated, k)  # (B, k) logits
            scores = jax.nn.sigmoid(scores)  # sigmoid(-inf) == 0: stays gated
        else:
            gated = jnp.where(flat > conf_thres, flat, -1.0)
            scores, idx = jax.lax.top_k(gated, k)  # (B, k)
        anchor = idx // nc
        classes = idx % nc
        boxes = jnp.take_along_axis(boxes, anchor[..., None], axis=1)
        extras = jnp.take_along_axis(extras, anchor[..., None], axis=1)
    else:
        scores = cls_scores.max(-1)
        classes = cls_scores.argmax(-1)
        if scores_are_logits:
            scores = jax.nn.sigmoid(scores)  # (B, A), not (B, A, nc)

    fn = partial(
        batched_nms,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        pre_nms=pre_nms,
        max_det=max_det,
        agnostic=agnostic,
    )
    return jax.vmap(fn)(boxes, scores, classes, extras)


@partial(jax.jit, static_argnames=("max_det", "agnostic"))
def non_max_suppression_selected(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    extras: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
    agnostic: bool = False,
):
    """NMS over PRE-SELECTED candidates — the filter-before-decode hot path.

    Inputs are the (B, k, .) outputs of ``head.decode_polar_topk``: the
    per-image top-k candidates by class score, already conf-gated (dead
    entries carry score 0) and sorted descending. ``batched_nms`` with
    pre_nms == k then re-ranks k already-sorted rows (a cheap no-op) and the
    suppression matrix works exactly as in the full-tensor path, so results
    are bit-identical to non_max_suppression_parts with the same pre_nms
    (pinned by tests/test_nms.py) while never touching a full-anchor-set
    boxes/extras tensor.
    """
    fn = partial(
        batched_nms,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        pre_nms=boxes.shape[1],
        max_det=max_det,
        agnostic=agnostic,
    )
    return jax.vmap(fn)(boxes, scores, classes, extras)
