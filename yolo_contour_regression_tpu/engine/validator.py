"""Validators — eval loop + metric accumulation per task.

TPU-native re-implementation of the reference BaseValidator
(engine/validator.py:38-279) and task validators (models/yolo/*/val.py).
The per-batch work — forward, polar decode, NMS, contour rasterization and
IoU matrices — is ONE jitted device program (the reference loops Python per
image, ops.py:285); only the tiny greedy TP matching runs on host.

Polar segment semantics (models/yolo/segment/val.py:17-339): postprocess is
polar NMS only, masks come from rasterizing the predicted 36-gon contours
(the piece the reference left commented out at ops.py:796 — first-class
here), TP matching at 10 IoU thresholds for both boxes and masks.
"""
from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg
from ..data.build import build_dataloader, build_yolo_dataset
from ..data.dataset import ClassificationDataset
from ..data.utils import check_cls_dataset, check_det_dataset
from ..nn.tasks import build_model
from ..ops.boxes import box_iou, scale_boxes, scale_coords, xywh2xyxy
from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from ..utils.metrics import (
    ClassifyMetrics,
    DetMetrics,
    IOU_THRESHES,
    SegmentMetrics,
    match_predictions,
)


def _coco_image_id(im_files, index: int) -> int:
    """File-stem image id when numeric (COCO convention), else running index."""
    if im_files is not None and index < len(im_files):
        stem = Path(im_files[index]).stem
        if stem.isdigit():
            return int(stem)
    return int(index)


def _append_coco_json(jdict, image_id: int, out, bi: int, ori_shape=None):
    """COCO-format prediction rows in NATIVE image space, with RLE
    segmentation rasterized from the predicted 36-gon contours (reference
    pred_to_json segment/val.py:268-339 emits RLE via pycocotools)."""
    keep = out["valid"][bi]
    boxes = out["boxes"][bi][keep]
    pts = out.get("pred_pts")
    ptsv = out.get("pred_pts_valid")
    rles = None
    if pts is not None and ori_shape is not None:
        import cv2

        from ..data.converter import mask_to_rle

        h0, w0 = int(round(ori_shape[0])), int(round(ori_shape[1]))
        rles = []
        for p, v in zip(pts[bi][keep], ptsv[bi][keep]):
            mask = np.zeros((h0, w0), np.uint8)
            poly = p[v].astype(np.int32)
            if poly.shape[0] >= 3:
                cv2.fillPoly(mask, [poly], 1)
            rles.append(mask_to_rle(mask))
    for i, (box, score, cls) in enumerate(
        zip(boxes, out["scores"][bi][keep], out["classes"][bi][keep])
    ):
        row = {
            "image_id": int(image_id),
            "category_id": int(cls),
            "bbox": [float(box[0]), float(box[1]), float(box[2] - box[0]), float(box[3] - box[1])],
            "score": round(float(score), 5),
        }
        if rles is not None:
            row["segmentation"] = rles[i]
        jdict.append(row)


def _write_coco_json(jdict, project=None, name: str = "predictions.json"):
    import json

    out = Path(project or "runs") / name
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as fh:
        json.dump(jdict, fh)
    LOGGER.info(f"saved {len(jdict)} predictions to {out}")
    return out


def eval_coco_json(pred_json, anno_json, task: str = "segment"):
    """Official pycocotools evaluation of a predictions.json against a COCO
    annotation file (reference eval_json, models/yolo/segment/val.py:313).
    Gated on pycocotools (absent in this image); returns
    {mAP50-95(B), mAP50(B)[, mAP50-95(M), mAP50(M)]} or None if unavailable."""
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
    except ImportError:
        LOGGER.warning("pycocotools not installed: skipping official COCO eval")
        return None
    anno = COCO(str(anno_json))
    pred = anno.loadRes(str(pred_json))
    out = {}
    ious = ["bbox", "segm"] if task in ("segment", "segment_ori") else ["bbox"]
    for iou_type in ious:
        ev = COCOeval(anno, pred, iou_type)
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        tag = "B" if iou_type == "bbox" else "M"
        out[f"metrics/mAP50-95({tag})"] = float(ev.stats[0])
        out[f"metrics/mAP50({tag})"] = float(ev.stats[1])
    return out


class BaseValidator:
    task = "detect"

    def __init__(self, args=None):
        self.args = args if args is not None else get_cfg()
        if self.args.conf is None:
            self.args.conf = 0.001  # val default (reference validator.py:99)
        self.speed = {}
        name = getattr(self.args, "name", None) or f"{self.task}_val"
        self.save_dir = Path(getattr(self.args, "project", None) or "runs") / name
        # per-instance caches: the trainer builds ONE validator and calls it
        # every epoch — re-lowering the full predict+NMS+raster graph each
        # call costs a fresh XLA compile per epoch on tunneled-TPU hosts
        self._eval_fn_cache = {}
        self._loader_cache = {}

    def _cached_eval_fn(self, key, builder):
        """Memoize a jitted eval fn keyed by everything that changes its
        traced graph: (model identity, imgsz, max_det, conf, iou, ...)."""
        fn = self._eval_fn_cache.get(key)
        if fn is None:
            fn = builder()
            self._eval_fn_cache[key] = fn
        return fn

    def _wrap_eval_core(self, key, core_builder):
        """Jit an UNJITTED eval core two ways: 'single' (one batch per
        dispatch) and 'scan' (a lax.scan over G stacked batches). Memoized
        like _cached_eval_fn."""

        def build():
            core = core_builder()

            def scan_fn(variables, *stacked):
                def body(c, xs):
                    return c, core(variables, *xs)

                _, outs = jax.lax.scan(body, 0, stacked)
                return outs

            return {"single": jax.jit(core), "scan": jax.jit(scan_fn)}

        return self._cached_eval_fn(key, build)

    def _dispatch_eval(self, loader, variables, fns, arg_keys):
        """Yield ``(batch, out_np, n_valid)`` per loader batch while running
        up to ``val_dispatch_group`` (default 8) batches per device call.

        The dispatch round-trip — not compute — dominates val wall-clock on
        hosts where the accelerator sits behind a high-latency link
        (docs/PERF_NOTES.md), so batches are stacked and scanned G at a time,
        mirroring the trainer's steps_per_dispatch. Rect val (per-batch
        letterbox shapes) keeps one dispatch per batch. Device time
        accumulates in ``self._t_dev``."""
        rect = bool(getattr(getattr(loader, "dataset", None), "rect", False))
        group = 1 if rect else max(
            1, int(getattr(self.args, "val_dispatch_group", 8) or 8)
        )
        self._t_dev = 0.0

        def flush(buf):
            if not buf:
                return
            td = time.perf_counter()
            if len(buf) == 1:
                nv, b = buf[0]
                out = fns["single"](
                    variables, *(jnp.asarray(b[k]) for k in arg_keys)
                )
                outs = {k: np.asarray(v)[None] for k, v in out.items()}
            else:
                # instance-bucketed collate (data/augment.py) can give the
                # batches different label pads — re-pad to the group max
                # before stacking (same as the trainer's _stack_raw_batches)
                for key in ("cls", "bboxes", "segments", "mask_gt", "keypoints"):
                    if key not in buf[0][1] or buf[0][1][key].ndim < 2:
                        continue  # classify: cls is (B,), no instance axis
                    n_max = max(b[key].shape[1] for _, b in buf)
                    for _, b in buf:
                        pad = n_max - b[key].shape[1]
                        if pad:
                            b[key] = np.pad(
                                b[key],
                                [(0, 0), (0, pad)]
                                + [(0, 0)] * (b[key].ndim - 2),
                            )
                out = fns["scan"](
                    variables,
                    *(jnp.asarray(np.stack([np.asarray(b[k]) for _, b in buf]))
                      for k in arg_keys),
                )
                outs = {k: np.asarray(v) for k, v in out.items()}
            self._t_dev += time.perf_counter() - td
            for gi, (nv, b) in enumerate(buf):
                yield b, {k: v[gi] for k, v in outs.items()}, nv

        buf = []
        for batch in loader:
            B = batch["img"].shape[0]
            nv = min(int(batch.pop("n_valid", B)), B)
            buf.append((nv, batch))
            if len(buf) >= group:
                yield from flush(buf)
                buf = []
        yield from flush(buf)

    def build_loader(self, data):
        from copy import copy

        key = (str(data.get("val")), int(self.args.batch), int(self.args.imgsz))
        loader = self._loader_cache.get(key)
        if loader is not None:
            return loader
        cfg = copy(self.args)
        cfg.task = self.task
        dataset = build_yolo_dataset(cfg, data["val"], self.args.batch, data, mode="val")
        loader = build_dataloader(
            dataset, self.args.batch, self.args.workers, shuffle=False, mode="val"
        )
        self._loader_cache[key] = loader
        return loader


class SegmentationValidator(BaseValidator):
    """Polar-contour mask + box mAP, matched in NATIVE image space.

    COCO protocol (reference models/yolo/segment/val.py:149-339): predictions
    are scaled back through the inverse letterbox (scale_boxes, ops.py:872)
    before TP matching, so mAP is invariant to the letterbox padding. Mask IoU
    is computed by rasterizing BOTH predicted 36-gons and GT 360-gons in
    native space onto an RxR grid (R = imgsz/mask_ratio, uniform per-image
    scale -> IoU equals native-space IoU up to raster resolution) via the
    streaming ``polygon_mask_iou`` op, which never materializes per-instance
    full-resolution masks.
    """

    task = "segment"

    def _make_eval_fn(self, model, mask_ratio: int, imgsz: int):
        from ..ops.raster import polygon_mask_iou

        max_det = self.args.max_det
        nc = model.nc
        R = max(imgsz // mask_ratio, 8)

        def eval_fn(variables, images, gt_bboxes, gt_segments, mask_gt, ori_shape, ratio_pad):
            # unjitted core — _wrap_eval_core jits it single and scanned.
            # parts-layout polar decode (head.py decode_polar_parts): no
            # (B, C, A) concat/transpose round-trip, [rays|anchor] carried
            # through NMS, contour points reconstructed for survivors only
            from ..ops.nms import non_max_suppression_parts

            boxes_p, logits_p, extras_p = model.predict_parts(
                variables, images, sigmoid=False
            )
            out = non_max_suppression_parts(
                boxes_p, logits_p, extras_p,
                conf_thres=self.args.conf,
                iou_thres=self.args.iou,
                pre_nms=getattr(self.args, "pre_nms", 4096),
                max_det=max_det, multi_label=True, scores_are_logits=True,
            )
            # pred boxes: letterbox px -> native px, clipped to native
            # bounds; GT: normalized letterbox -> native px
            boxes_nat = scale_boxes(out["boxes"], ratio_pad, ori_shape)
            gt_nat = scale_boxes(
                xywh2xyxy(gt_bboxes)
                * jnp.asarray([images.shape[2], images.shape[1]] * 2,
                              jnp.float32),
                ratio_pad, ori_shape
            )
            ious_box = jax.vmap(box_iou)(gt_nat, boxes_nat)  # (B, N, max_det)

            # contours -> native px
            from ..nn.modules.head import finalize_polar_extras

            ex = finalize_polar_extras(out["extras"])  # (B, max_det, 108)
            ppts = scale_coords(
                jnp.stack([ex[..., :36], ex[..., 36:72]], -1), ratio_pad
            )
            pvalid = (ex[..., 72:108] > 0.5) & out["valid"][..., None]
            gpts = scale_coords(
                gt_segments
                * jnp.asarray([images.shape[2], images.shape[1]], jnp.float32),
                ratio_pad,
            )
            gvalid = jnp.broadcast_to(mask_gt[..., None], gpts.shape[:-1])
            # uniform per-image scale onto the R x R raster grid
            s = (R / jnp.maximum(ori_shape.max(-1), 1.0))[:, None, None, None]
            ious_mask = jax.vmap(
                lambda gp, gv, pp, pv: polygon_mask_iou(gp, gv, pp, pv, R, R)
            )(gpts * s, gvalid, ppts * s, pvalid)
            return {
                "boxes": boxes_nat,
                "scores": out["scores"],
                "classes": out["classes"],
                "valid": out["valid"],
                "ious_box": ious_box,
                "ious_mask": ious_mask,
                "gt_boxes": gt_nat,
                "pred_pts": ppts,
                "pred_pts_valid": pvalid,
            }

        return eval_fn

    def __call__(self, model=None, variables=None, data=None, loader=None) -> Dict[str, float]:
        from ..utils.metrics import ConfusionMatrix

        args = self.args
        if isinstance(data, (str, Path)):
            data = check_det_dataset(data)
        if model is None:
            raise ValueError("validator needs a model")
        if loader is None:
            loader = self.build_loader(data)
        names = getattr(model, "names", {}) or {}
        metrics = SegmentMetrics(names=names)
        cm = ConfusionMatrix(model.nc)
        # TP matching rasterizes at R = imgsz / val_mask_ratio; 1 (full-res
        # grid) matches the reference's full-resolution fillPoly protocol
        # (models/yolo/segment/val.py:226 + utils/metrics.py:133) — the old
        # mask_ratio=4 shortcut cost 0.016 mask-mAP50-95 vs the oracle
        mask_ratio = getattr(args, "val_mask_ratio", 1) or 1
        fns = self._wrap_eval_core(
            (id(model), mask_ratio, args.imgsz, args.max_det, args.conf,
             args.iou, getattr(args, "pre_nms", 4096)),
            lambda: self._make_eval_fn(model, mask_ratio, args.imgsz),
        )
        im_files = getattr(getattr(loader, "dataset", None), "im_files", None)

        n_img = 0
        t0 = time.time()
        jdict = []
        first_batch = None
        for batch, out, nv in self._dispatch_eval(
            loader, variables, fns,
            ("img", "bboxes", "segments", "mask_gt", "ori_shape", "ratio_pad"),
        ):
            if first_batch is None:
                first_batch = ({k: v for k, v in batch.items()}, out, nv)
            for bi in range(nv):
                keep = out["valid"][bi]
                gt_keep = batch["mask_gt"][bi]
                pred_cls = out["classes"][bi][keep]
                conf = out["scores"][bi][keep]
                tcls = batch["cls"][bi][gt_keep]
                iou_b = out["ious_box"][bi][gt_keep][:, keep]
                iou_m = out["ious_mask"][bi][gt_keep][:, keep]
                tp_b = match_predictions(pred_cls, tcls, iou_b)
                tp_m = match_predictions(pred_cls, tcls, iou_m)
                metrics.box.update(tp_b, conf, pred_cls, tcls)
                metrics.seg.update(tp_m, conf, pred_cls, tcls)
                cm.process_batch(
                    out["boxes"][bi][keep], pred_cls, conf,
                    out["gt_boxes"][bi][gt_keep], tcls,
                )
                if args.save_json:
                    _append_coco_json(
                        jdict, _coco_image_id(im_files, n_img + bi), out, bi,
                        ori_shape=batch["ori_shape"][bi],
                    )
            n_img += nv
        metrics.process()
        dt = time.time() - t0
        res = metrics.results_dict
        if args.save_json and jdict:
            pred_path = _write_coco_json(jdict, getattr(args, "project", None))
            anno = data.get("anno_json") if isinstance(data, dict) else None
            if anno:
                official = eval_coco_json(pred_path, anno, task=self.task)
                if official:
                    res.update(official)
        if getattr(args, "plots", False):
            from ..utils.plotting import plot_pr_curve

            cm.plot(self.save_dir, names)
            for m, tag in ((metrics.box, "B"), (metrics.seg, "M")):
                if m.results.get("pr_curve") is not None and m.results.get("ap") is not None:
                    rx, pc = m.results["pr_curve"]
                    plot_pr_curve(
                        rx, pc, m.results["ap"][:, 0],
                        self.save_dir / f"PR_curve_{tag}.png",
                        names=names, classes=m.results["classes"],
                    )
            if first_batch is not None:
                self._plot_val_batch(first_batch, names)
        # per-image speed, reference validator.py:183 summary line style
        self.speed = {"device_ms_per_img": round(self._t_dev / max(n_img, 1) * 1e3, 2)}
        LOGGER.info(
            f"val: {n_img} imgs  box mAP50-95 {res['metrics/mAP50-95(B)']:.4f}  "
            f"mask mAP50-95 {res['metrics/mAP50-95(M)']:.4f}  "
            f"({self.speed['device_ms_per_img']:.1f} ms/img device, {dt:.1f}s total)"
        )
        return res

    def _plot_val_batch(self, first_batch, names):
        """Save GT vs prediction mosaics for the first val batch (reference
        plot_val_samples/plot_predictions, models/yolo/segment/val.py:243)."""
        try:
            from ..utils.plotting import plot_images

            batch, out, nv = first_batch
            plot_images(
                batch["img"][:nv], {k: v[:nv] for k, v in batch.items() if k != "img"},
                fname=str(self.save_dir / "val_batch0_labels.jpg"), names=names,
            )
            # predictions overlaid in letterbox space: rebuild normalized
            # xywh from the native boxes via the forward letterbox transform
            import numpy as _np

            imgsz = batch["img"].shape[1]
            n_show = min(out["boxes"].shape[1], 48)
            pred_like = {
                "cls": _np.zeros((nv, n_show), _np.int32),
                "bboxes": _np.zeros((nv, n_show, 4), _np.float32),
                "mask_gt": _np.zeros((nv, n_show), bool),
            }
            for bi in range(nv):
                g, px, py = batch["ratio_pad"][bi]
                bx = out["boxes"][bi][:n_show] * g + _np.asarray([px, py, px, py])
                pred_like["bboxes"][bi] = _np.concatenate(
                    [(bx[:, :2] + bx[:, 2:]) / 2, bx[:, 2:] - bx[:, :2]], -1
                ) / imgsz
                pred_like["mask_gt"][bi] = out["valid"][bi][:n_show]
                pred_like["cls"][bi] = out["classes"][bi][:n_show]
            plot_images(
                batch["img"][:nv], pred_like,
                fname=str(self.save_dir / "val_batch0_pred.jpg"), names=names,
            )
        except Exception as e:  # plotting must never fail validation
            from ..utils import LOGGER as _L

            _L.warning(f"val batch plot failed: {e}")


class SegmentationOriValidator(BaseValidator):
    """Stock prototype-mask segmentation validation (reference
    models/yolo/segment_ori/val.py ~357 LoC): NMS carries the nm mask
    coefficients, masks = sigmoid(coeffs @ proto) cropped to each box and
    thresholded at 0.5 (reference process_mask, utils/ops.py:716-851), box TP
    in native space, mask TP at proto resolution in letterbox space (the
    reference protocol; letterboxing both masks identically makes the IoU a
    uniform rescale of native space, so padding does not bias it)."""

    task = "segment_ori"

    def _make_eval_fn(self, model, imgsz: int):
        from ..ops.raster import fill_polygons

        max_det = self.args.max_det
        nc = model.nc
        nm = model.head_spec.kwargs.get("nm", 32)

        def eval_fn(variables, images, gt_bboxes, gt_segments, mask_gt, ori_shape, ratio_pad):
            # unjitted core — _wrap_eval_core jits it single and scanned
            pred, proto = model.predict(variables, images)  # (B,4+nc+nm,A), (B,hp,wp,nm)
            boxes_xywh = pred[:, :4]
            pred = pred.at[:, :4].set(
                jnp.transpose(xywh2xyxy(jnp.transpose(boxes_xywh, (0, 2, 1))), (0, 2, 1))
            )
            out = non_max_suppression(
                pred.astype(jnp.float32), nc=nc, conf_thres=self.args.conf,
                iou_thres=self.args.iou, pre_nms=getattr(self.args, "pre_nms", 4096),
                max_det=max_det, multi_label=True,
            )
            boxes_nat = scale_boxes(out["boxes"], ratio_pad, ori_shape)
            gt_nat = scale_boxes(
                xywh2xyxy(gt_bboxes)
                * jnp.asarray([images.shape[2], images.shape[1]] * 2,
                              jnp.float32),
                ratio_pad, ori_shape
            )
            ious_box = jax.vmap(box_iou)(gt_nat, boxes_nat)

            # process_mask (reference ops.py:716): sigmoid(coeffs @ proto),
            # crop to the pred box (proto coords), threshold 0.5
            hp, wp = proto.shape[1], proto.shape[2]
            coeffs = out["extras"].astype(jnp.float32)  # (B, D, nm)
            pm = jax.nn.sigmoid(jnp.einsum("bdm,bhwm->bdhw", coeffs, proto.astype(jnp.float32)))
            r = hp / images.shape[1]
            bx = out["boxes"] * r  # letterbox px -> proto grid
            py = jnp.arange(hp, dtype=jnp.float32)[None, None, :, None]
            px = jnp.arange(wp, dtype=jnp.float32)[None, None, None, :]
            inbox = (
                (px >= bx[..., 0, None, None]) & (px < bx[..., 2, None, None])
                & (py >= bx[..., 1, None, None]) & (py < bx[..., 3, None, None])
            )
            pm = (pm > 0.5) & inbox & out["valid"][..., None, None]

            # GT masks at proto res from the 360-pt contours
            gpts = gt_segments * jnp.asarray([wp, hp], jnp.float32)
            gvalid = jnp.broadcast_to(mask_gt[..., None], gpts.shape[:-1])
            gm = jax.vmap(lambda p, v: fill_polygons(p, v, hp, wp))(gpts, gvalid)

            pmf = pm.reshape(*pm.shape[:2], -1).astype(jnp.float32)
            gmf = gm.reshape(*gm.shape[:2], -1).astype(jnp.float32)
            inter = jnp.einsum("bnp,bdp->bnd", gmf, pmf)
            union = gmf.sum(-1)[:, :, None] + pmf.sum(-1)[:, None, :] - inter
            ious_mask = inter / (union + 1e-7)
            return {
                "boxes": boxes_nat,
                "scores": out["scores"],
                "classes": out["classes"],
                "valid": out["valid"],
                "ious_box": ious_box,
                "ious_mask": ious_mask,
                "gt_boxes": gt_nat,
            }

        return eval_fn

    def __call__(self, model=None, variables=None, data=None, loader=None) -> Dict[str, float]:
        from ..utils.metrics import ConfusionMatrix

        args = self.args
        if isinstance(data, (str, Path)):
            data = check_det_dataset(data)
        if model is None:
            raise ValueError("validator needs a model")
        if loader is None:
            loader = self.build_loader(data)
        names = getattr(model, "names", {}) or {}
        metrics = SegmentMetrics(names=names)
        cm = ConfusionMatrix(model.nc)
        fns = self._wrap_eval_core(
            (id(model), args.imgsz, args.max_det, args.conf, args.iou,
             getattr(args, "pre_nms", 4096)),
            lambda: self._make_eval_fn(model, args.imgsz),
        )

        n_img = 0
        t0 = time.time()
        for batch, out, nv in self._dispatch_eval(
            loader, variables, fns,
            ("img", "bboxes", "segments", "mask_gt", "ori_shape", "ratio_pad"),
        ):
            for bi in range(nv):
                keep = out["valid"][bi]
                gt_keep = batch["mask_gt"][bi]
                pred_cls = out["classes"][bi][keep]
                conf = out["scores"][bi][keep]
                tcls = batch["cls"][bi][gt_keep]
                tp_b = match_predictions(pred_cls, tcls, out["ious_box"][bi][gt_keep][:, keep])
                tp_m = match_predictions(pred_cls, tcls, out["ious_mask"][bi][gt_keep][:, keep])
                metrics.box.update(tp_b, conf, pred_cls, tcls)
                metrics.seg.update(tp_m, conf, pred_cls, tcls)
                cm.process_batch(
                    out["boxes"][bi][keep], pred_cls, conf,
                    out["gt_boxes"][bi][gt_keep], tcls,
                )
            n_img += nv
        metrics.process()
        res = metrics.results_dict
        if getattr(args, "plots", False):
            cm.plot(self.save_dir, names)
        LOGGER.info(
            f"val(segment_ori): {n_img} imgs  box mAP50-95 {res['metrics/mAP50-95(B)']:.4f}  "
            f"mask mAP50-95 {res['metrics/mAP50-95(M)']:.4f}  ({time.time() - t0:.1f}s)"
        )
        return res


class DetectionValidator(BaseValidator):
    """Box mAP matched in native image space (reference
    models/yolo/detect/val.py + ops.py:872 scale_boxes)."""

    task = "detect"

    def _make_eval_fn(self, model, imgsz: int):
        nc = model.nc
        max_det = self.args.max_det

        def eval_fn(variables, images, gt_bboxes, ori_shape, ratio_pad):
            # unjitted core — _wrap_eval_core jits it single and scanned
            pred = model.predict(variables, images)  # (B, 4+nc, A) xywh
            boxes_xywh = pred[:, :4]
            pred = pred.at[:, :4].set(
                jnp.transpose(
                    xywh2xyxy(jnp.transpose(boxes_xywh, (0, 2, 1))), (0, 2, 1)
                )
            )
            out = non_max_suppression(
                pred.astype(jnp.float32), nc=nc, conf_thres=self.args.conf,
                iou_thres=self.args.iou, pre_nms=getattr(self.args, "pre_nms", 4096),
                max_det=max_det, multi_label=True,
            )
            boxes_nat = scale_boxes(out["boxes"], ratio_pad, ori_shape)
            gt_nat = scale_boxes(
                xywh2xyxy(gt_bboxes)
                * jnp.asarray([images.shape[2], images.shape[1]] * 2,
                              jnp.float32),
                ratio_pad, ori_shape
            )
            ious_box = jax.vmap(box_iou)(gt_nat, boxes_nat)
            return {
                "boxes": boxes_nat, "scores": out["scores"],
                "classes": out["classes"], "valid": out["valid"],
                "ious_box": ious_box, "gt_boxes": gt_nat,
            }

        return eval_fn

    def __call__(self, model=None, variables=None, data=None, loader=None) -> Dict[str, float]:
        from ..utils.metrics import ConfusionMatrix

        args = self.args
        if isinstance(data, (str, Path)):
            data = check_det_dataset(data)
        if loader is None:
            loader = self.build_loader(data)
        names = getattr(model, "names", {}) or {}
        metrics = DetMetrics(names=names)
        cm = ConfusionMatrix(model.nc)
        fns = self._wrap_eval_core(
            (id(model), args.imgsz, args.max_det, args.conf, args.iou,
             getattr(args, "pre_nms", 4096)),
            lambda: self._make_eval_fn(model, args.imgsz),
        )
        im_files = getattr(getattr(loader, "dataset", None), "im_files", None)
        n_img = 0
        t0 = time.time()
        jdict = []
        for batch, out, nv in self._dispatch_eval(
            loader, variables, fns, ("img", "bboxes", "ori_shape", "ratio_pad")
        ):
            for bi in range(nv):
                keep = out["valid"][bi]
                gt_keep = batch["mask_gt"][bi]
                pred_cls = out["classes"][bi][keep]
                conf = out["scores"][bi][keep]
                tcls = batch["cls"][bi][gt_keep]
                tp = match_predictions(
                    pred_cls, tcls, out["ious_box"][bi][gt_keep][:, keep]
                )
                metrics.box.update(tp, conf, pred_cls, tcls)
                cm.process_batch(
                    out["boxes"][bi][keep], pred_cls, conf,
                    out["gt_boxes"][bi][gt_keep], tcls,
                )
                if args.save_json:
                    _append_coco_json(
                        jdict, _coco_image_id(im_files, n_img + bi), out, bi
                    )
            n_img += nv
        metrics.process()
        res = metrics.results_dict
        if args.save_json and jdict:
            _write_coco_json(jdict, getattr(args, "project", None))
        if getattr(args, "plots", False):
            from ..utils.plotting import plot_pr_curve

            cm.plot(self.save_dir, names)
            m = metrics.box
            if m.results.get("pr_curve") is not None and m.results.get("ap") is not None:
                rx, pc = m.results["pr_curve"]
                plot_pr_curve(
                    rx, pc, m.results["ap"][:, 0], self.save_dir / "PR_curve.png",
                    names=names, classes=m.results["classes"],
                )
        LOGGER.info(
            f"val: {n_img} imgs  box mAP50-95 {res['metrics/mAP50-95(B)']:.4f}  "
            f"({time.time() - t0:.1f}s)"
        )
        return res


class PoseValidator(DetectionValidator):
    """Pose validation: box mAP + keypoint OKS mAP (reference
    models/yolo/pose/val.py)."""

    task = "pose"

    def __call__(self, model=None, variables=None, data=None, loader=None) -> Dict[str, float]:
        from ..nn.modules.head import decode_pose
        from ..utils.loss import OKS_SIGMA
        from ..utils.metrics import PoseMetrics, kpt_iou

        args = self.args
        if isinstance(data, (str, Path)):
            data = check_det_dataset(data)
        if loader is None:
            loader = self.build_loader(data)
        metrics = PoseMetrics(names=getattr(model, "names", {}))
        imgsz = args.imgsz
        kpt_shape = model.kpt_shape
        nk = kpt_shape[0] * kpt_shape[1]
        # COCO sigmas only for the 17-kpt layout, else uniform (reference
        # models/yolo/pose/val.py:57)
        sigma = (
            np.asarray(OKS_SIGMA)
            if kpt_shape[0] == len(OKS_SIGMA)
            else np.full(kpt_shape[0], 1.0 / kpt_shape[0])
        )
        nc = model.nc
        max_det = args.max_det

        def _build():
            def eval_fn(variables, images, gt_bboxes, ori_shape, ratio_pad):
                # unjitted core — _wrap_eval_core jits it single and scanned
                pred = model.predict(variables, images)  # (B, 4+nc+nk, A)
                boxes_xywh = pred[:, :4]
                pred = pred.at[:, :4].set(
                    jnp.transpose(xywh2xyxy(jnp.transpose(boxes_xywh, (0, 2, 1))), (0, 2, 1))
                )
                out = non_max_suppression(
                    pred.astype(jnp.float32), nc=nc, conf_thres=args.conf,
                    iou_thres=args.iou, pre_nms=getattr(args, "pre_nms", 4096),
                    max_det=max_det, multi_label=True,
                )
                boxes_nat = scale_boxes(out["boxes"], ratio_pad, ori_shape)
                gt_nat = scale_boxes(
                    xywh2xyxy(gt_bboxes)
                * jnp.asarray([images.shape[2], images.shape[1]] * 2,
                              jnp.float32),
                ratio_pad, ori_shape
                )
                ious_box = jax.vmap(box_iou)(gt_nat, boxes_nat)
                # keypoints: letterbox px -> native px
                k = out["extras"].reshape(*out["extras"].shape[:2], kpt_shape[0], kpt_shape[1])
                k = k.at[..., :2].set(scale_coords(k[..., :2], ratio_pad))
                return {
                    **out, "boxes": boxes_nat, "gt_boxes": gt_nat,
                    "ious_box": ious_box, "kpts": k,
                }

            return eval_fn

        fns = self._wrap_eval_core(
            (id(model), args.imgsz, max_det, args.conf, args.iou,
             getattr(args, "pre_nms", 4096)),
            _build,
        )

        t0 = time.time()
        n_img = 0
        for batch, out, nv in self._dispatch_eval(
            loader, variables, fns, ("img", "bboxes", "ori_shape", "ratio_pad")
        ):
            n_img += nv
            for bi in range(nv):
                keep = out["valid"][bi]
                gt_keep = batch["mask_gt"][bi]
                pred_cls = out["classes"][bi][keep]
                conf = out["scores"][bi][keep]
                tcls = batch["cls"][bi][gt_keep]
                tp_b = match_predictions(
                    pred_cls, tcls, out["ious_box"][bi][gt_keep][:, keep]
                )
                metrics.box.update(tp_b, conf, pred_cls, tcls)
                if "keypoints" in batch:
                    gain_i, (padx, pady) = batch["ratio_pad"][bi][0], batch["ratio_pad"][bi][1:3]
                    pk = out["kpts"][bi][keep]
                    gk = batch["keypoints"][bi][gt_keep].copy()
                    bh, bw = batch["img"].shape[1:3]  # per-axis (rect val)
                    gk[..., 0] = (gk[..., 0] * bw - padx) / gain_i
                    gk[..., 1] = (gk[..., 1] * bh - pady) / gain_i
                    gb = out["gt_boxes"][bi][gt_keep]
                    area = np.clip(
                        (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1]) * 0.53, 1, None
                    )
                    oks = kpt_iou(gk, pk, area, sigma)
                    tp_p = match_predictions(pred_cls, tcls, oks)
                    metrics.pose.update(tp_p, conf, pred_cls, tcls)
        metrics.process()
        metrics.pose.process()
        res = metrics.results_dict
        LOGGER.info(
            f"val(pose): {n_img} imgs  box mAP50-95 {res['metrics/mAP50-95(B)']:.4f}  "
            f"pose mAP50-95 {res.get('metrics/mAP50-95(P)', 0.0):.4f} "
            f"({time.time() - t0:.1f}s)"
        )
        return res


class ClassificationValidator(BaseValidator):
    task = "classify"

    def __call__(self, model=None, variables=None, data=None, loader=None) -> Dict[str, float]:
        args = self.args
        if isinstance(data, (str, Path)):
            data = check_cls_dataset(data)
        if loader is None:
            key = (str(data["val"]), int(args.batch), int(args.imgsz))
            loader = self._loader_cache.get(key)
            if loader is None:
                dataset = ClassificationDataset(data["val"], imgsz=args.imgsz, augment=False)
                loader = build_dataloader(
                    dataset, args.batch, args.workers, shuffle=False, mode="val"
                )
                self._loader_cache[key] = loader
        metrics = ClassifyMetrics()

        def _build():
            def eval_fn(variables, images):
                # unjitted core — _wrap_eval_core jits it single and scanned
                return {"preds": model.predict(variables, images)}

            return eval_fn

        fns = self._wrap_eval_core((id(model), args.imgsz), _build)

        t0 = time.time()
        n = 0
        for batch, out, nv in self._dispatch_eval(loader, variables, fns, ("img",)):
            metrics.update(out["preds"][:nv], np.asarray(batch["cls"])[:nv])
            n += nv
        res = metrics.results_dict
        LOGGER.info(
            f"val: {n} imgs  top1 {res['metrics/accuracy_top1']:.4f}  "
            f"top5 {res['metrics/accuracy_top5']:.4f}  ({time.time() - t0:.1f}s)"
        )
        return res
