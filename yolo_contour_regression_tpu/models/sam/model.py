"""SAM model assembly + promptable predictor.

Re-implementation of the reference ``models/sam/`` surface: ``Sam``
(modules/sam.py: encoder + prompt encoder + mask decoder with pre/post),
``build_sam`` size variants (build.py), and the prompt ``Predictor``
(predict.py): set_image once, then point/box prompts produce masks.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import LOGGER
from .modules import ImageEncoderViT, MaskDecoder, PromptEncoder

SAM_VARIANTS = {
    # embed_dim, depth, num_heads, global_attn_indexes
    "sam_b": (768, 12, 12, (2, 5, 8, 11)),
    "sam_l": (1024, 24, 16, (5, 11, 17, 23)),
    "sam_h": (1280, 32, 16, (7, 15, 23, 31)),
}
# TinyViT-encoder variants (reference build.py:build_mobile_sam)
MOBILE_VARIANTS = ("mobile_sam", "sam_t")


class Sam:
    """Functional SAM: variables pytree + pure apply fns."""

    mask_threshold: float = 0.0
    # official SAM input normalization ((x_255 - mean) / std, zero-padded
    # AFTER normalize) — required for converted pretrained checkpoints
    pixel_mean = np.array([123.675, 116.28, 103.53], np.float32)
    pixel_std = np.array([58.395, 57.12, 57.375], np.float32)

    def __init__(self, variant: str = "sam_b", img_size: int = 1024, dtype=jnp.float32):
        self.img_size = img_size
        if variant in MOBILE_VARIANTS:  # MobileSAM: TinyViT-5M encoder
            from .tinyvit import TinyViT

            self.encoder = TinyViT(img_size=img_size, dtype=dtype)
        else:
            ed, depth, nh, gai = SAM_VARIANTS[variant]
            self.encoder = ImageEncoderViT(
                img_size=img_size, embed_dim=ed, depth=depth, num_heads=nh,
                global_attn_indexes=gai, dtype=dtype,
            )
        emb_hw = img_size // 16
        self.prompt_encoder = PromptEncoder(
            image_embedding_size=(emb_hw, emb_hw),
            input_image_size=(img_size, img_size), dtype=dtype,
        )
        self.decoder = MaskDecoder(dtype=dtype)
        self.variables: Optional[Dict] = None

    def init(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, self.img_size, self.img_size, 3))
        enc_v = self.encoder.init(k1, dummy)
        pts = jnp.zeros((1, 2, 2))
        labs = jnp.zeros((1, 2), jnp.int32)
        emb_hw = self.img_size // 16
        # init with a dummy low-res mask prompt so the mask-downscaling conv
        # params materialize (the no-mask branch never touches them)
        dmask = jnp.zeros((1, emb_hw * 4, emb_hw * 4, 1))
        pe_v = self.prompt_encoder.init(k2, pts, labs, dmask)
        sparse, dense, image_pe = self.prompt_encoder.apply(pe_v, pts, labs)
        dummy_emb = jnp.zeros((1, emb_hw, emb_hw, 256))
        dec_v = self.decoder.init(k3, dummy_emb, image_pe, sparse, dense)
        self.variables = {"encoder": enc_v, "prompt": pe_v, "decoder": dec_v}
        return self.variables

    # -- pure fns -------------------------------------------------------------
    def encode_image(self, variables, image):
        """image (B, S, S, 3) float, normalized per ``pixel_mean``/``std``
        -> embeddings (B, S/16, S/16, 256)."""
        return self.encoder.apply(variables["encoder"], image)

    def load_torch_weights(self, source, strict: bool = True):
        """Load an official SAM checkpoint (``sam_vit_b/l/h .pth`` state
        dict, reference models/sam/build.py:133 attempt_download + load) —
        ``source`` is a path or an already-extracted name->numpy dict."""
        from ...utils.torch_convert import (
            convert_sam_state_dict,
            extract_state_dict,
            load_torch_checkpoint,
        )

        if not isinstance(source, dict):
            source = extract_state_dict(load_torch_checkpoint(source))
        if self.variables is None:
            self.init()
        self.variables, report = convert_sam_state_dict(
            source, self.variables, strict=strict
        )
        return report

    def decode_prompts(self, variables, embeddings, points, labels, masks=None,
                       multimask=True):
        """masks: optional (B, 4h, 4w, 1) low-res mask-prompt logits,
        typically a previous iteration's output (reference predict.py:105
        ``masks=`` path)."""
        sparse, dense, image_pe = self.prompt_encoder.apply(
            variables["prompt"], points, labels, masks
        )
        return self.decoder.apply(
            variables["decoder"], embeddings, image_pe, sparse, dense,
            multimask_output=multimask,
        )

    @property
    def num_params(self):
        if self.variables is None:
            self.init()
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(self.variables))


class Predictor:
    """Promptable predictor (reference models/sam/predict.py Predictor)."""

    def __init__(self, model: Optional[Sam] = None, img_size: int = 1024):
        self.model = model or Sam(img_size=img_size)
        if self.model.variables is None:
            self.model.init()
        self._emb = None
        self._scale = 1.0
        self._orig_hw = None
        self._encode = jax.jit(self.model.encode_image)
        self._decode = jax.jit(
            lambda v, e, p, l, m: self.model.decode_prompts(v, e, p, l, m)
        )
        self._amg_batch = jax.jit(self._amg_batch_fn)

    def set_image(self, image: np.ndarray):
        """BGR uint8 image -> cached embeddings."""
        import cv2

        self._orig_hw = image.shape[:2]
        s = self.model.img_size
        r = min(s / image.shape[0], s / image.shape[1])
        nh, nw = round(image.shape[0] * r), round(image.shape[1] * r)
        resized = cv2.resize(image, (nw, nh))
        rgb = cv2.cvtColor(resized, cv2.COLOR_BGR2RGB).astype(np.float32)
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = (rgb - self.model.pixel_mean) / self.model.pixel_std
        self._scale = r
        self._emb = self._encode(self.model.variables, jnp.asarray(canvas)[None])

    def predict(self, point_coords=None, point_labels=None, box=None,
                mask_input=None, multimask_output=True, return_logits=False):
        """Points (P, 2) px + labels (P,), and/or box (4,) xyxy px, and/or a
        low-res mask prompt (4h, 4w) logits from a previous iteration
        (reference predict.py:105 ``masks=``) ->
        (masks (T, H, W) bool, iou_pred (T,)); with ``return_logits`` also
        the low-res logits (T, 4h, 4w) for iterative prompting."""
        assert self._emb is not None, "call set_image first"
        pts, labs = [], []
        if point_coords is not None:
            pts.extend(np.asarray(point_coords, np.float32) * self._scale)
            labs.extend(np.asarray(point_labels, np.int32))
        if box is not None:
            b = np.asarray(box, np.float32) * self._scale
            pts.extend([b[:2], b[2:]])
            labs.extend([2, 3])
        else:
            # official _embed_points pads a (0,0)/-1 point whenever no box
            # prompt is present — checkpoint numerics depend on it
            pts.append([0.0, 0.0])
            labs.append(-1)
        if not pts:
            pts, labs = [[0.0, 0.0]], [-1]
        p = jnp.asarray(np.asarray(pts, np.float32))[None]
        l = jnp.asarray(np.asarray(labs, np.int32))[None]
        m = None
        if mask_input is not None:
            m = jnp.asarray(np.asarray(mask_input, np.float32))[None, ..., None]
        masks, iou = self._decode(self.model.variables, self._emb, p, l, m)
        masks = np.asarray(masks)[0]  # (T, s/4, s/4)
        import cv2

        h, w = self._orig_hw
        s = self.model.img_size
        out = []
        for mk in masks:
            full = cv2.resize(mk, (s, s), interpolation=cv2.INTER_LINEAR)
            crop = full[: round(h * self._scale), : round(w * self._scale)]
            out.append(cv2.resize(crop, (w, h)) > self.model.mask_threshold)
        if return_logits:
            return np.stack(out), np.asarray(iou)[0], masks
        return np.stack(out), np.asarray(iou)[0]

    # -- automatic everything-segmentation (AMG) -------------------------------
    def _amg_batch_fn(self, variables, emb, pts, thresh, offset):
        """One fixed-shape point-grid dispatch: pts (P, 2) model-input px ->
        low-res mask logits (P, 3, hq, wq), iou (P, 3), stability (P, 3).
        The whole grid batch rides one device program — each point becomes a
        prompt batch element with the official (0,0)/-1 pad point, and the
        stability ratio (reference amg.py calculate_stability_score) is
        computed in-graph on the low-res logits (the hi/lo pixel-count ratio
        is resolution-invariant up to interpolation, so filtering at hq x wq
        avoids materializing P*3 full-res masks)."""
        P = pts.shape[0]
        points = jnp.stack([pts, jnp.zeros_like(pts)], 1)  # (P, 2, 2)
        labels = jnp.broadcast_to(jnp.asarray([1, -1], jnp.int32), (P, 2))
        embs = jnp.broadcast_to(emb, (P,) + emb.shape[1:])
        logits, iou = self.model.decode_prompts(
            variables, embs, points, labels, multimask=True
        )
        hi = (logits > thresh + offset).sum((-1, -2)).astype(jnp.float32)
        lo = (logits > thresh - offset).sum((-1, -2)).astype(jnp.float32)
        stability = hi / jnp.maximum(lo, 1.0)
        return logits, iou, stability

    def generate(self, image, crop_n_layers=0, crop_overlap_ratio=512 / 1500,
                 crop_downscale_factor=1, point_grids=None, points_stride=32,
                 points_batch_size=64, conf_thres=0.88,
                 stability_score_thresh=0.95, stability_score_offset=0.95,
                 iou_thres=0.7, crop_nms_thresh=0.7, min_mask_region_area=0,
                 crop_edge_atol=20.0):
        """Segment everything (reference predict.py:178–294 generate):
        crop-box tiling -> per-crop point-grid prompting in fixed-size
        batches -> confidence + stability filtering -> in-crop NMS ->
        cross-crop dedupe by 1/region-area -> optional small-region cleanup.

        Deviations from the reference, both documented as corrections:
        each crop is resized to the square model input and grid points are
        placed in model-input coordinates (the reference passes crop-space
        points against a model-input-resized crop, which mis-scales prompts
        for crop layers > 0), and stability filtering happens on the low-res
        logits in-graph (one dispatch per fixed-size point batch) rather
        than on per-batch full-res upsamples.

        Returns (masks (N, H, W) bool, scores (N,), boxes (N, 4) xyxy px).
        """
        import cv2

        from .amg import (batched_mask_to_box, build_all_layer_point_grids,
                          generate_crop_boxes, is_box_near_crop_edge,
                          nms_boxes)

        image = np.asarray(image)
        h, w = image.shape[:2]
        crop_regions, layer_idxs = generate_crop_boxes(
            (h, w), crop_n_layers, crop_overlap_ratio
        )
        if point_grids is None:
            point_grids = build_all_layer_point_grids(
                points_stride, crop_n_layers, crop_downscale_factor
            )
        s = self.model.img_size
        thr = jnp.float32(self.model.mask_threshold)
        off = jnp.float32(stability_score_offset)
        all_masks, all_boxes, all_scores, region_areas = [], [], [], []
        for region, layer in zip(crop_regions, layer_idxs):
            x0, y0, x1, y1 = region
            cw, ch = x1 - x0, y1 - y0
            crop = image[y0:y1, x0:x1]
            resized = cv2.resize(crop, (s, s)).astype(np.float32)
            if resized.ndim == 2:
                resized = np.repeat(resized[..., None], 3, -1)
            rgb = resized[..., ::-1]  # BGR -> RGB
            norm = (rgb - self.model.pixel_mean) / self.model.pixel_std
            emb = self._encode(self.model.variables, jnp.asarray(norm)[None])
            pts = (point_grids[layer] * s).astype(np.float32)  # model-input px
            keep_logits, keep_scores = [], []
            for i in range(0, len(pts), points_batch_size):
                chunk = pts[i : i + points_batch_size]
                n = len(chunk)
                if n < points_batch_size:  # pad the tail: one program, all batches
                    chunk = np.concatenate(
                        [chunk, np.zeros((points_batch_size - n, 2), np.float32)]
                    )
                logits, iou, stab = self._amg_batch(
                    self.model.variables, emb, jnp.asarray(chunk), thr, off
                )
                logits = np.asarray(logits[:n]).reshape(n * 3, *logits.shape[2:])
                iou = np.asarray(iou[:n]).reshape(-1)
                stab = np.asarray(stab[:n]).reshape(-1)
                sel = (iou > conf_thres) & (stab > stability_score_thresh)
                if sel.any():
                    keep_logits.append(logits[sel])
                    keep_scores.append(iou[sel])
            if not keep_logits:
                continue
            lo = np.concatenate(keep_logits)
            scores = np.concatenate(keep_scores)
            # one batched device resize to crop resolution, then threshold
            up = np.asarray(
                jax.image.resize(jnp.asarray(lo), (len(lo), ch, cw), "bilinear")
            )
            masks = up > self.model.mask_threshold
            boxes = batched_mask_to_box(masks)
            keep = ~is_box_near_crop_edge(
                boxes + [x0, y0, x0, y0], region, [0, 0, w, h], atol=crop_edge_atol
            )
            keep &= masks.any((-1, -2))  # drop empty masks
            masks, boxes, scores = masks[keep], boxes[keep], scores[keep]
            if not len(masks):
                continue
            keep = nms_boxes(boxes, scores, iou_thres)
            # uncrop into the full image frame
            full = np.zeros((len(keep), h, w), bool)
            full[:, y0:y1, x0:x1] = masks[keep]
            all_masks.append(full)
            all_boxes.append(boxes[keep] + [x0, y0, x0, y0])
            all_scores.append(scores[keep])
            region_areas.append(np.full(len(keep), cw * ch, np.float32))
        if not all_masks:
            return (np.zeros((0, h, w), bool), np.zeros(0, np.float32),
                    np.zeros((0, 4), np.float32))
        masks = np.concatenate(all_masks)
        boxes = np.concatenate(all_boxes)
        scores = np.concatenate(all_scores)
        areas = np.concatenate(region_areas)
        if len(crop_regions) > 1:  # cross-crop dedupe, smaller crops preferred
            keep = nms_boxes(boxes, 1.0 / areas, crop_nms_thresh)
            masks, boxes, scores = masks[keep], boxes[keep], scores[keep]
        if min_mask_region_area > 0:
            masks, keep = self.remove_small_regions(masks, min_mask_region_area)
            boxes, scores = boxes[keep], scores[keep]
        return masks, scores, boxes

    @staticmethod
    def remove_small_regions(masks, min_area=0, nms_thresh=0.7):
        """Drop small disconnected islands and fill small holes, then rerun
        box NMS to drop any newly-created duplicates (reference
        predict.py:366–408). Returns (masks, kept-index array)."""
        from .amg import batched_mask_to_box, nms_boxes, remove_small_regions

        if len(masks) == 0:
            return masks, np.zeros(0, np.int64)
        cleaned, scores = [], []
        for m in masks:
            m2, ch_holes = remove_small_regions(m, min_area, mode="holes")
            m2, ch_isl = remove_small_regions(m2, min_area, mode="islands")
            cleaned.append(m2)
            # unchanged masks score 1 so NMS prefers them over repaired ones
            scores.append(0.0 if (ch_holes or ch_isl) else 1.0)
        cleaned = np.stack(cleaned)
        keep = nms_boxes(
            batched_mask_to_box(cleaned), np.asarray(scores, np.float32), nms_thresh
        )
        return cleaned[keep], keep


def build_sam(variant: str = "sam_b", img_size: int = 1024) -> Sam:
    """(reference models/sam/build.py build_sam): NOTE pretrained SAM weights
    cannot be fetched in this zero-egress environment; the architecture is
    fully functional for training/fine-tuning and for loading converted
    weights via the variables pytree."""
    if variant not in SAM_VARIANTS and variant not in MOBILE_VARIANTS:
        raise ValueError(
            f"variant '{variant}' not in {list(SAM_VARIANTS) + list(MOBILE_VARIANTS)}"
        )
    return Sam(variant=variant, img_size=img_size)


class SAM:
    """User-facing handle (reference models/sam/model.py SAM)."""

    def __init__(self, model: str = "sam_b", img_size: int = 1024):
        if str(model).endswith((".pt", ".pth")):
            # checkpoint path: infer the variant from the filename
            # (sam_b.pt / sam_vit_l.pth / mobile_sam.pt ...), build, convert
            stem = str(model).rsplit("/", 1)[-1]
            variant = next(
                (v for v in ("sam_h", "sam_l", "sam_b", "mobile_sam", "sam_t")
                 if v in stem or v.replace("sam_", "vit_") in stem),
                "sam_b",
            )
            self.model = build_sam(variant, img_size)
            self.model.init()
            self.model.load_torch_weights(model)
        else:
            self.model = build_sam(model, img_size)
        self.predictor: Optional[Predictor] = None

    def predict(self, source, points=None, labels=None, bboxes=None,
                masks=None, **kw):
        """With prompts: (masks, iou). With no prompts at all: segment
        everything (reference predict.py:101–103 inference dispatch) and
        return (masks, scores) — boxes via :meth:`generate`."""
        import cv2

        if self.predictor is None:
            self.predictor = Predictor(self.model)
        img = cv2.imread(source) if isinstance(source, str) else np.asarray(source)
        if points is None and bboxes is None and masks is None:
            m, s, _ = self.predictor.generate(img, **kw)
            return m, s
        self.predictor.set_image(img)
        return self.predictor.predict(points, labels, bboxes, mask_input=masks)

    def generate(self, source, **kw):
        """Everything-mode: (masks (N, H, W) bool, scores (N,), boxes (N, 4))."""
        import cv2

        if self.predictor is None:
            self.predictor = Predictor(self.model)
        img = cv2.imread(source) if isinstance(source, str) else np.asarray(source)
        return self.predictor.generate(img, **kw)

    def info(self):
        n = self.model.num_params
        LOGGER.info(f"SAM: {n:,} params @ {self.model.img_size}px")
        return {"parameters": n}
