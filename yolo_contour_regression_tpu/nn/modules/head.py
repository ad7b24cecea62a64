"""Prediction heads — flax.linen, NHWC.

TPU-native re-implementation of the reference head zoo
(``ultralytics/nn/modules/head.py``):

  - ``PolarSegment``: the canonical "polarpaper" polar-contour head — cv2
    branch -> 36 raw ray distances, cv3 branch -> nc class logits per FPN
    level (head.py:364-433 polarpaperDetect + head.py:436-574 Segment). The
    eval-time ray decode lives in ``ops/polar.py:decode_rays`` / in
    ``decode_polar`` below, *in-graph*, so the exported model contains decode
    (unlike the reference, which drops it at export — head.py:572).
  - ``Detect``: stock YOLOv8 DFL detect head (head.py:25 oriDetect shape).
  - ``SegmentProto``: stock prototype-mask seg head (head.py:731 Segmentori).
  - ``Classify``: conv+pool+linear, fork change: always sigmoid
    (head.py:805-822).
  - ``Pose``: keypoint head (head.py:764-802).

Heads return raw per-level NHWC maps; decode helpers are pure functions of
(raw maps, strides) so train/eval/export all share one compiled graph shape.
"""
from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import polar as polar_ops
from ...ops.boxes import dist2bbox
from .block import DFL, Proto
from .conv import Conv


class PolarSegment(nn.Module):
    """Polar contour-regression segment head (canonical 'polarpaper' config).

    Per level i: cv2[i] = Conv3x3 -> Conv3x3 -> 1x1(36 rays),
                 cv3[i] = Conv3x3 -> Conv3x3 -> 1x1(nc logits).
    Output per level: (B, H, W, nm + nc) with rays first (reference forward
    concatenates cv2 then cv3, head.py:390).
    """

    nc: int = 80
    nm: int = polar_ops.NUM_RAYS
    npr: int = 256  # kept for yaml-arg parity; unused (no prototypes in polar)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, 16 * 4)
        c3 = max(ch0, min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            rays = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            rays = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(rays, train)
            rays = nn.Conv(
                self.nm, (1, 1), use_bias=True, dtype=self.dtype, name=f"cv2_{i}_2"
            )(rays)
            cls = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            cls = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(cls, train)
            cls = nn.Conv(
                self.nc, (1, 1), use_bias=True, dtype=self.dtype, name=f"cv3_{i}_2"
            )(cls)
            outs.append(jnp.concatenate([rays, cls], axis=-1))
        return outs


def flatten_levels(outs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """[(B, H, W, C)...] -> (B, A, C), matching the reference's row-major
    per-level flatten + concat (head.py:398 x_cat)."""
    b = outs[0].shape[0]
    c = outs[0].shape[-1]
    return jnp.concatenate([o.reshape(b, -1, c) for o in outs], axis=1)


def decode_polar(
    outs: Sequence[jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    nm: int = polar_ops.NUM_RAYS,
):
    """Eval-time polar decode — reference Segment.forward eval path +
    distance2mask (head.py:461-550), producing (B, 4 + nc + 3*nm, A):
    [xyxy box | nc sigmoid scores | 36 seg-x | 36 seg-y | 36 valid flags].
    """
    feat_hw = [(o.shape[1], o.shape[2]) for o in outs]
    anchor_points, stride_t = polar_ops.make_anchors(feat_hw, strides, dtype=outs[0].dtype)
    x = flatten_levels(outs)  # (B, A, nm+nc)
    rays, cls = x[..., :nm], x[..., nm:]
    rays_px = rays * stride_t[None, :, :]  # broadcast (A,1)
    anchors_px = anchor_points * stride_t
    points, valid, boxes = polar_ops.decode_rays(rays_px, anchors_px)
    scores = nn.sigmoid(cls)
    allpred = jnp.concatenate(
        [
            boxes,
            scores,
            points[..., 0],
            points[..., 1],
            valid.astype(x.dtype),
        ],
        axis=-1,
    )  # (B, A, 4+nc+108)
    return jnp.transpose(allpred, (0, 2, 1))  # (B, 4+nc+108, A) — reference layout


def decode_polar_lazy(
    outs: Sequence[jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    nm: int = polar_ops.NUM_RAYS,
):
    """Bandwidth-lean eval decode: (B, 4 + nc + 38, A) with extras =
    [36 rays_px | anchor_px xy] instead of the 108 decoded contour values.

    ``decode_polar`` materializes (B, A, 36, 2) contour points for every
    anchor before NMS keeps only max_det of them — at A=8400 that tensor is
    the single largest HBM consumer in the deploy pipeline
    (runs/bench_ablate.json: +3.6 ms at batch 128, +9.2 ms at 256, the
    batch-256 throughput cliff). Boxes come from the fused rays→min/max
    reduce (ops/polar.py decode_ray_boxes); contour points are reconstructed
    AFTER NMS from the carried rays+anchor by ``finalize_polar_extras`` —
    numerically identical output (same clamp, same trig), 36+2 carried
    columns instead of 108. The full-layout ``decode_polar`` remains the
    export contract (ONNX consumers get decoded contours)."""
    feat_hw = [(o.shape[1], o.shape[2]) for o in outs]
    anchor_points, stride_t = polar_ops.make_anchors(feat_hw, strides, dtype=outs[0].dtype)
    x = flatten_levels(outs)  # (B, A, nm+nc)
    rays, cls = x[..., :nm], x[..., nm:]
    rays_px = rays * stride_t[None, :, :]
    anchors_px = anchor_points * stride_t
    boxes = polar_ops.decode_ray_boxes(rays_px, anchors_px)
    scores = nn.sigmoid(cls)
    anc = jnp.broadcast_to(anchors_px[None], (x.shape[0],) + anchors_px.shape)
    allpred = jnp.concatenate(
        [boxes, scores, jnp.clip(rays_px, polar_ops.RAY_EPS, None), anc], axis=-1
    )  # (B, A, 4+nc+38)
    return jnp.transpose(allpred, (0, 2, 1))


def decode_polar_parts(
    outs: Sequence[jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    nm: int = polar_ops.NUM_RAYS,
    sigmoid: bool = True,
):
    """Hot-path polar decode: (boxes (B, A, 4), scores (B, A, nc),
    extras (B, A, nm+2) [rays_px | anchor_px]) — unconcatenated, untransposed.

    Feeds ``ops.nms.non_max_suppression_parts`` directly; contour points are
    reconstructed for the max_det survivors by ``finalize_polar_extras``.
    Numerically identical to decode_polar + NMS over the (B, 4+nc+108, A)
    tensor, but skips the 108-column contour materialization, the concat and
    the two (B, C, A) layout transposes — at batch 128 / A=8400 that is
    ~750 MB of HBM traffic the reference layout spends per dispatch
    (runs/bench_ablate.json r4). decode_polar remains the export contract.
    """
    feat_hw = [(o.shape[1], o.shape[2]) for o in outs]
    anchor_points, stride_t = polar_ops.make_anchors(feat_hw, strides, dtype=outs[0].dtype)
    x = flatten_levels(outs)  # (B, A, nm+nc)
    rays, cls = x[..., :nm], x[..., nm:]
    rays_px = jnp.clip(rays * stride_t[None, :, :], polar_ops.RAY_EPS, None)
    anchors_px = anchor_points * stride_t
    boxes = polar_ops.decode_ray_boxes(rays_px, anchors_px)
    # sigmoid=False hands raw logits to NMS (scores_are_logits=True there):
    # the normalize then runs on the (B, A) reduction instead of (B, A, nc)
    scores = nn.sigmoid(cls) if sigmoid else cls
    anc = jnp.broadcast_to(anchors_px[None], (x.shape[0],) + anchors_px.shape)
    extras = jnp.concatenate([rays_px, anc.astype(rays_px.dtype)], axis=-1)
    return boxes, scores, extras


def decode_polar_topk(
    outs: Sequence[jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    nm: int = polar_ops.NUM_RAYS,
    k: int = 1024,
    conf_thres=0.25,
):
    """Filter-before-decode polar decode: select the top-``k`` candidates by
    class score FIRST, then decode boxes/extras for those k anchors only.

    ``decode_polar_parts`` still materializes full-anchor-set tensors after
    the level flatten — boxes (B, A, 4), the [rays|anchor] extras concat
    (B, A, 38) — of which NMS keeps at most ``pre_nms`` rows. Candidate
    selection needs nothing but the class logits: the per-anchor max/argmax
    is monotonic under sigmoid, so gating at logit(conf_thres) and top-k on
    raw logits picks the identical candidate set, and rays are gathered and
    decoded for the k winners alone (28x fewer anchors at A=8400, k=1024).
    Outputs feed ``ops.nms.non_max_suppression_selected``; the combination is
    bit-identical to decode_polar_parts + non_max_suppression_parts
    (pinned by tests/test_nms.py). Best-class semantics only — the val-mode
    multi_label path keeps the parts layout.

    Returns (boxes (B, k, 4), scores (B, k) sigmoid-space descending with
    gated-out entries 0, classes (B, k) int32, extras (B, k, nm+2)).
    """
    feat_hw = [(o.shape[1], o.shape[2]) for o in outs]
    anchor_points, stride_t = polar_ops.make_anchors(feat_hw, strides, dtype=outs[0].dtype)
    x = flatten_levels(outs)  # (B, A, nm+nc)
    rays, cls = x[..., :nm], x[..., nm:]
    best = cls.max(-1)  # (B, A) logits
    classes = cls.argmax(-1).astype(jnp.int32)
    # same gate mapping as non_max_suppression_parts(scores_are_logits=True)
    c = jnp.asarray(conf_thres, jnp.float32)
    safe = jnp.clip(c, 1e-12, 1.0 - 1e-7)
    logit_thr = jnp.where(c > 0, jnp.log(safe) - jnp.log1p(-safe), -jnp.inf)
    gated = jnp.where(best > logit_thr.astype(best.dtype), best, -jnp.inf)
    k = min(k, gated.shape[-1])
    top_logits, order = jax.lax.top_k(gated, k)  # (B, k)
    scores = jax.nn.sigmoid(top_logits)  # sigmoid(-inf) == 0: stays gated

    rays_k = jnp.take_along_axis(rays, order[..., None], axis=1)  # (B, k, 36)
    anchors_px = anchor_points * stride_t  # (A, 2)
    rays_px = jnp.clip(rays_k * stride_t[order], polar_ops.RAY_EPS, None)
    anc_k = anchors_px[order].astype(rays_px.dtype)  # (B, k, 2)
    boxes = polar_ops.decode_ray_boxes(rays_px, anc_k)
    extras = jnp.concatenate([rays_px, anc_k], axis=-1)
    return boxes, scores, jnp.take_along_axis(classes, order, axis=1), extras


def finalize_polar_extras(ex: jnp.ndarray, nm: int = polar_ops.NUM_RAYS):
    """Post-NMS half of the lazy decode: extras (..., 38) [rays_px |
    anchor_px] -> the standard 108 layout (..., 108) [36 x | 36 y | 36
    valid], identical to what ``decode_polar`` carries through NMS."""
    rays, anc = ex[..., :nm], ex[..., nm:]
    points, valid, _ = polar_ops.decode_rays(rays, anc)
    return jnp.concatenate(
        [points[..., 0], points[..., 1], valid.astype(ex.dtype)], axis=-1
    )


class Detect(nn.Module):
    """Stock YOLOv8 detect head with DFL box regression (head.py:25)."""

    nc: int = 80
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, self.reg_max * 4)
        c3 = max(ch0, min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            box = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            box = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(box, train)
            box = nn.Conv(
                4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype, name=f"cv2_{i}_2"
            )(box)
            cls = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            cls = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(cls, train)
            cls = nn.Conv(
                self.nc, (1, 1), use_bias=True, dtype=self.dtype, name=f"cv3_{i}_2"
            )(cls)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs


def decode_detect(outs, strides, nc: int, reg_max: int = 16):
    """Eval-time DFL decode: softmax-expectation over bins -> ltrb -> xywh
    boxes in pixels + sigmoid scores. (B, 4+nc, A), reference head.py:56-72."""
    feat_hw = [(o.shape[1], o.shape[2]) for o in outs]
    anchor_points, stride_t = polar_ops.make_anchors(feat_hw, strides, dtype=outs[0].dtype)
    x = flatten_levels(outs)  # (B, A, 4*reg_max+nc)
    box_dist, cls = x[..., : 4 * reg_max], x[..., 4 * reg_max :]
    b, a, _ = box_dist.shape
    probs = nn.softmax(box_dist.reshape(b, a, 4, reg_max), axis=-1)
    proj = jnp.arange(reg_max, dtype=probs.dtype)
    ltrb = jnp.einsum("bakr,r->bak", probs, proj)
    dbox = dist2bbox(ltrb, anchor_points[None], xywh=True, axis=-1) * stride_t[None]
    y = jnp.concatenate([dbox, nn.sigmoid(cls)], axis=-1)
    return jnp.transpose(y, (0, 2, 1))


class SegmentProto(nn.Module):
    """Stock prototype-mask segmentation head (head.py:731 Segmentori):
    Detect + per-level mask-coefficient branch + Proto net on P3."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        det_outs = Detect(self.nc, self.reg_max, dtype=self.dtype, name="detect")(
            feats, train
        )
        proto = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(feats[0], train)
        c4 = max(feats[0].shape[-1] // 4, self.nm)
        mc = []
        for i, x in enumerate(feats):
            m = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            m = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, train)
            m = nn.Conv(self.nm, (1, 1), use_bias=True, dtype=self.dtype, name=f"cv4_{i}_2")(m)
            mc.append(m)
        return [jnp.concatenate([d, m], axis=-1) for d, m in zip(det_outs, mc)], proto


class Pose(nn.Module):
    """Keypoint head (head.py:764): Detect + per-level kpt branch."""

    nc: int = 1
    kpt_shape: Tuple[int, int] = (17, 3)
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        det_outs = Detect(self.nc, self.reg_max, dtype=self.dtype, name="detect")(
            feats, train
        )
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(feats[0].shape[-1] // 4, nk)
        kpts = []
        for i, x in enumerate(feats):
            k = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            k = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(k, train)
            k = nn.Conv(nk, (1, 1), use_bias=True, dtype=self.dtype, name=f"cv4_{i}_2")(k)
            kpts.append(k)
        return [jnp.concatenate([d, k], axis=-1) for d, k in zip(det_outs, kpts)]


def decode_pose(kpt_raw, strides, feat_hw, kpt_shape=(17, 3)):
    """Decode raw keypoint maps (B, A, nk) -> pixel keypoints (head.py:789
    kpts_decode): xy = (raw*2 + anchor - 0.5) * stride, vis = sigmoid."""
    anchor_points, stride_t = polar_ops.make_anchors(feat_hw, strides, dtype=kpt_raw.dtype)
    b, a, nk = kpt_raw.shape
    k = kpt_raw.reshape(b, a, kpt_shape[0], kpt_shape[1])
    xy = (k[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]
    if kpt_shape[1] == 3:
        vis = nn.sigmoid(k[..., 2:3])
        return jnp.concatenate([xy, vis], axis=-1)
    return xy


class Classify(nn.Module):
    """Classification head (head.py:805): Conv -> GAP -> dropout -> linear;
    fork change: output always sigmoid (head.py:820)."""

    nc: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = 1280
        x = Conv(c_, 1, 1, dtype=self.dtype, name="conv")(x, train)
        x = x.mean(axis=(1, 2))  # global average pool
        x = nn.Dropout(0.0, deterministic=not train)(x)
        x = nn.Dense(self.nc, dtype=self.dtype, name="linear")(x)
        return nn.sigmoid(x)


class RTDETRDecoder(nn.Module):
    """RT-DETR decoder head (reference head.py:825-1017 RTDETRDecoder):
    per-level 1x1 projection -> flattened multi-scale tokens -> encoder head
    with top-nq query selection from grid anchors -> deformable-attention
    decoder stack with iterative box refinement.

    Eval output: (B, nq, 4 + nc) — normalized cxcywh + sigmoid scores.
    Training returns (dec_bboxes, dec_scores, enc_bboxes, enc_scores); with a
    ``dn`` dict (models/utils/ops.py get_cdn_group: contrastive-denoising
    groups, reference ops.py:260), the dn queries are prepended to the
    matching queries with a block-diagonal self-attention mask — matching
    queries never see dn queries, dn groups never see each other — and the
    decoder outputs cover dn + matching so the criterion can split them."""

    nc: int = 80
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False, dn=None):
        from .transformer import (
            MLP,
            DeformableTransformerDecoderLayer,
            inverse_sigmoid,
        )

        nl = len(feats)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        B = feats[0].shape[0]

        # per-level projection to hidden dim (conv 1x1 + BN, no act) — uses
        # the repo Conv module so deploy-time BN folding applies (nn/fuse.py;
        # raw nn.Conv+nn.BatchNorm siblings would strand the running stats
        # after fuse_variables and break fused predict)
        from .conv import Conv as _Conv

        tokens = []
        for i, f in enumerate(feats):
            p = _Conv(self.hd, 1, 1, act=False, dtype=self.dtype,
                      name=f"input_proj{i}")(f, train)
            tokens.append(p.reshape(B, -1, self.hd))
        feats_flat = jnp.concatenate(tokens, axis=1)  # (B, V, hd)

        # grid anchors in logit space (reference _generate_anchors, grid 0.05*2^i)
        anchors, valid = [], []
        for i, (h, w) in enumerate(shapes):
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
            # NOTE reference divides by valid_WH=[h, w] -- x by h, y by w; this
            # is a bug for non-square maps; we normalize correctly (x/w, y/h)
            xy = jnp.stack([(gx + 0.5) / w, (gy + 0.5) / h], -1).reshape(-1, 2)
            wh = jnp.full_like(xy, 0.05 * (2.0**i))
            anchors.append(jnp.concatenate([xy, wh], -1))
        anchors = jnp.concatenate(anchors, 0)[None]  # (1, V, 4)
        valid_mask = ((anchors > 1e-2) & (anchors < 1 - 1e-2)).all(-1, keepdims=True)
        anchors_logit = jnp.where(valid_mask, inverse_sigmoid(anchors), jnp.inf)

        # encoder head + top-nq query selection
        enc_feats = nn.LayerNorm(name="enc_output_ln")(
            nn.Dense(self.hd, dtype=self.dtype, name="enc_output")(feats_flat * valid_mask)
        )
        # score-head bias prior + zero-init bbox deltas (reference
        # head.py:996-1008 _reset_parameters: bias_init_with_prob(0.01) on
        # every score head, zeroed last bbox-MLP layer): queries start as
        # "background at the anchor", which DETR convergence relies on
        bias_cls = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        enc_scores_all = nn.Dense(
            self.nc, dtype=self.dtype, bias_init=bias_cls, name="enc_score_head"
        )(enc_feats)
        nq = min(self.nq, enc_scores_all.shape[1])  # tiny-image graceful cap
        topk_val, topk_ind = jax.lax.top_k(enc_scores_all.max(-1), nq)  # (B, nq)
        top_feats = jnp.take_along_axis(enc_feats, topk_ind[..., None], axis=1)
        top_anchors = jnp.take_along_axis(
            jnp.broadcast_to(anchors_logit, (B,) + anchors_logit.shape[1:]),
            topk_ind[..., None], axis=1,
        )
        refer_logit = MLP(self.hd, 4, 3, zero_last=True, dtype=self.dtype,
                          name="enc_bbox_head")(top_feats) + top_anchors
        enc_bboxes = nn.sigmoid(refer_logit)
        enc_scores = jnp.take_along_axis(enc_scores_all, topk_ind[..., None], axis=1)

        embed = jax.lax.stop_gradient(top_feats) if train else top_feats
        refer_l = jax.lax.stop_gradient(refer_logit) if train else refer_logit

        attn_mask = None
        if train and dn is not None:
            # prepend denoising queries (reference head.py:964 torch.cat of
            # dn_embed/dn_bbox before the matching queries)
            B_, G, two, N = dn["labels"].shape
            dn_q = G * two * N
            dn_embed = nn.Embed(
                self.nc, self.hd, dtype=self.dtype, name="denoising_class_embed"
            )(jnp.clip(dn["labels"], 0, self.nc - 1)).reshape(B_, dn_q, self.hd)
            dn_bbox = dn["boxes_logit"].reshape(B_, dn_q, 4).astype(embed.dtype)
            embed = jnp.concatenate([dn_embed, embed], axis=1)
            refer_l = jnp.concatenate([dn_bbox, refer_l], axis=1)
            # block-diagonal self-attention mask (True = may attend):
            # matching rows see only matching; dn rows see own group + matching
            total = dn_q + nq
            gid = jnp.repeat(jnp.arange(G), two * N)  # (dn_q,)
            row_g = jnp.concatenate([gid, jnp.full((nq,), -1)])
            is_match = row_g < 0
            same_group = row_g[:, None] == row_g[None, :]
            allow = (
                (is_match[:, None] & is_match[None, :])  # match <-> match
                | (~is_match[:, None] & is_match[None, :])  # dn -> match
                | (same_group & ~is_match[:, None])  # dn -> own group
            )
            attn_mask = allow[None, None]  # (1, 1, Q, Q) broadcasts over B, heads

        refer = nn.sigmoid(refer_l)

        dec_bboxes, dec_scores = [], []
        query_pos_head = MLP(2 * self.hd, self.hd, 2, dtype=self.dtype, name="query_pos_head")
        last_refined = None
        for i in range(self.ndl):
            embed = DeformableTransformerDecoderLayer(
                self.hd, self.nh, self.d_ffn, nl, self.ndp, dtype=self.dtype,
                name=f"dec_layer{i}",
            )(embed, refer, feats_flat, shapes, attn_mask=attn_mask,
              query_pos=query_pos_head(refer))
            delta = MLP(self.hd, 4, 3, zero_last=True, dtype=self.dtype,
                        name=f"dec_bbox_head{i}")(embed)
            refined = nn.sigmoid(delta + inverse_sigmoid(refer))
            # score head applied every layer so train/eval share one param
            # structure (eval keeps only the last; XLA DCEs the rest)
            score_i = nn.Dense(self.nc, dtype=self.dtype, bias_init=bias_cls,
                               name=f"dec_score_head{i}")(embed)
            if train:
                dec_scores.append(score_i)
                # iterative-refinement gradient chaining (reference
                # transformer.py DeformableTransformerDecoder.forward): aux
                # box i>0 re-derives from the UNdetached previous refinement,
                # so layer i's box loss also trains layer i-1's bbox head;
                # only the refer fed forward is detached
                if i == 0:
                    dec_bboxes.append(refined)
                else:
                    dec_bboxes.append(
                        nn.sigmoid(delta + inverse_sigmoid(last_refined))
                    )
                last_refined = refined
                refer = jax.lax.stop_gradient(refined)
            else:
                if i == self.ndl - 1:
                    dec_scores.append(score_i)
                    dec_bboxes.append(refined)
                refer = refined
        if train:
            return (
                jnp.stack(dec_bboxes), jnp.stack(dec_scores), enc_bboxes, enc_scores,
            )
        return jnp.concatenate([dec_bboxes[-1], nn.sigmoid(dec_scores[-1])], -1)  # (B, nq, 4+nc)


def init_head_biases(params: dict, head_name: str, strides: Sequence[int], nc: int, polar: bool):
    """Post-init bias priors (reference head.py:427 bias_init): ray/box branch
    final bias = 1.0, cls branch final bias = log(5 / nc / (640/stride)^2).
    Operates on the already-initialized param pytree (functional surgery)."""
    head = params[head_name]
    for i, s in enumerate(strides):
        cv2 = head[f"cv2_{i}_2"] if f"cv2_{i}_2" in head else head["detect"][f"cv2_{i}_2"]
        cv2["bias"] = jnp.ones_like(cv2["bias"]) if polar else cv2["bias"]
        cv3 = head[f"cv3_{i}_2"] if f"cv3_{i}_2" in head else head["detect"][f"cv3_{i}_2"]
        cv3["bias"] = jnp.full_like(cv3["bias"], math.log(5 / nc / (640 / s) ** 2))
    return params
