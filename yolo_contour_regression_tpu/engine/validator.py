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
from ..ops.boxes import box_iou, xywh2xyxy
from ..ops.nms import non_max_suppression
from ..ops.pallas_raster import fill_polygons_fast as fill_polygons
from ..utils import LOGGER
from ..utils.metrics import (
    ClassifyMetrics,
    DetMetrics,
    IOU_THRESHES,
    SegmentMetrics,
    match_predictions,
)


def _append_coco_json(jdict, image_id: int, out, bi: int):
    """COCO-format prediction rows (reference pred_to_json segment/val.py:268)."""
    keep = out["valid"][bi]
    boxes = out["boxes"][bi][keep]
    for box, score, cls in zip(boxes, out["scores"][bi][keep], out["classes"][bi][keep]):
        jdict.append(
            {
                "image_id": int(image_id),
                "category_id": int(cls),
                "bbox": [float(box[0]), float(box[1]), float(box[2] - box[0]), float(box[3] - box[1])],
                "score": round(float(score), 5),
            }
        )


def _write_coco_json(jdict, project=None, name: str = "predictions.json"):
    import json

    out = Path(project or "runs") / name
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as fh:
        json.dump(jdict, fh)
    LOGGER.info(f"saved {len(jdict)} predictions to {out}")
    return out


class BaseValidator:
    task = "detect"

    def __init__(self, args=None):
        self.args = args if args is not None else get_cfg()
        if self.args.conf is None:
            self.args.conf = 0.001  # val default (reference validator.py:99)
        self.speed = {}

    def build_loader(self, data):
        from copy import copy

        cfg = copy(self.args)
        cfg.task = self.task
        dataset = build_yolo_dataset(cfg, data["val"], self.args.batch, data, mode="val")
        return build_dataloader(
            dataset, self.args.batch, self.args.workers, shuffle=False, mode="val"
        )


class SegmentationValidator(BaseValidator):
    """Polar-contour mask + box mAP."""

    task = "segment"

    def _make_eval_fn(self, model, mask_ratio: int, imgsz: int):
        max_det = self.args.max_det
        nc = model.nc
        mh = mw = imgsz // mask_ratio

        @jax.jit
        def eval_fn(variables, images, gt_cls, gt_bboxes, gt_segments, mask_gt):
            B = images.shape[0]
            pred = model.predict(variables, images)  # (B, 4+nc+108, A)
            out = non_max_suppression(
                pred.astype(jnp.float32),
                nc=nc,
                conf_thres=self.args.conf,
                iou_thres=self.args.iou,
                pre_nms=getattr(self.args, "pre_nms", 1024),
                max_det=max_det,
            )
            # pred contours -> masks at mask_ratio downsample
            ex = out["extras"]  # (B, max_det, 108)
            pts = jnp.stack([ex[..., :36], ex[..., 36:72]], -1) / mask_ratio
            valid_rays = (ex[..., 72:108] > 0.5) & out["valid"][..., None]
            pred_masks = jax.vmap(lambda p, v: fill_polygons(p, v, mh, mw))(
                pts, valid_rays
            )  # (B, max_det, mh, mw)
            # gt masks from 360-pt contours (normalized -> mask grid)
            gt_pts = gt_segments * jnp.asarray([mw, mh], jnp.float32)
            gt_valid = jnp.broadcast_to(mask_gt[..., None], gt_pts.shape[:-1])
            gt_masks = jax.vmap(lambda p, v: fill_polygons(p, v, mh, mw))(
                gt_pts, gt_valid
            )  # (B, N, mh, mw)

            # IoU matrices on device
            gt_xyxy = xywh2xyxy(gt_bboxes) * imgsz
            ious_box = jax.vmap(box_iou)(gt_xyxy, out["boxes"])  # (B, N, max_det)
            pm = pred_masks.reshape(B, max_det, -1).astype(jnp.float32)
            gm = gt_masks.reshape(B, gt_masks.shape[1], -1).astype(jnp.float32)
            inter = jnp.einsum("bnp,bmp->bnm", gm, pm)
            union = gm.sum(-1)[:, :, None] + pm.sum(-1)[:, None, :] - inter
            ious_mask = inter / (union + 1e-7)
            return {
                "boxes": out["boxes"],
                "scores": out["scores"],
                "classes": out["classes"],
                "valid": out["valid"],
                "ious_box": ious_box,
                "ious_mask": ious_mask,
            }

        return eval_fn

    def __call__(self, model=None, variables=None, data=None, loader=None) -> Dict[str, float]:
        args = self.args
        if isinstance(data, (str, Path)):
            data = check_det_dataset(data)
        if model is None:
            raise ValueError("validator needs a model")
        if loader is None:
            loader = self.build_loader(data)
        metrics = SegmentMetrics(names=getattr(model, "names", {}))
        mask_ratio = getattr(args, "mask_ratio", 4) or 4
        eval_fn = self._make_eval_fn(model, mask_ratio, args.imgsz)

        n_img = 0
        t0 = time.time()
        jdict = []
        for batch in loader:
            images = jnp.asarray(batch["img"])
            out = eval_fn(
                variables,
                images,
                jnp.asarray(batch["cls"]),
                jnp.asarray(batch["bboxes"]),
                jnp.asarray(batch["segments"]),
                jnp.asarray(batch["mask_gt"]),
            )
            out = {k: np.asarray(v) for k, v in out.items()}
            B = images.shape[0]
            for bi in range(B):
                if args.save_json:
                    _append_coco_json(jdict, n_img + bi, out, bi)
            n_img += B
            for bi in range(B):
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
        metrics.process()
        dt = time.time() - t0
        res = metrics.results_dict
        if args.save_json and jdict:
            _write_coco_json(jdict, getattr(args, "project", None))
        LOGGER.info(
            f"val: {n_img} imgs  box mAP50-95 {res['metrics/mAP50-95(B)']:.4f}  "
            f"mask mAP50-95 {res['metrics/mAP50-95(M)']:.4f}  ({dt:.1f}s)"
        )
        return res


class DetectionValidator(BaseValidator):
    task = "detect"

    def _make_eval_fn(self, model, imgsz: int):
        nc = model.nc
        max_det = self.args.max_det

        @jax.jit
        def eval_fn(variables, images, gt_bboxes):
            pred = model.predict(variables, images)  # (B, 4+nc, A) xywh
            boxes_xywh = pred[:, :4]
            pred = pred.at[:, :4].set(
                jnp.transpose(
                    xywh2xyxy(jnp.transpose(boxes_xywh, (0, 2, 1))), (0, 2, 1)
                )
            )
            out = non_max_suppression(
                pred.astype(jnp.float32), nc=nc, conf_thres=self.args.conf,
                iou_thres=self.args.iou, pre_nms=getattr(self.args, "pre_nms", 1024),
                max_det=max_det,
            )
            gt_xyxy = xywh2xyxy(gt_bboxes) * imgsz
            ious_box = jax.vmap(box_iou)(gt_xyxy, out["boxes"])
            return {
                "boxes": out["boxes"], "scores": out["scores"],
                "classes": out["classes"], "valid": out["valid"],
                "ious_box": ious_box,
            }

        return eval_fn

    def __call__(self, model=None, variables=None, data=None, loader=None) -> Dict[str, float]:
        args = self.args
        if isinstance(data, (str, Path)):
            data = check_det_dataset(data)
        if loader is None:
            loader = self.build_loader(data)
        metrics = DetMetrics(names=getattr(model, "names", {}))
        eval_fn = self._make_eval_fn(model, args.imgsz)
        n_img = 0
        t0 = time.time()
        for batch in loader:
            images = jnp.asarray(batch["img"])
            out = eval_fn(variables, images, jnp.asarray(batch["bboxes"]))
            out = {k: np.asarray(v) for k, v in out.items()}
            for bi in range(images.shape[0]):
                keep = out["valid"][bi]
                gt_keep = batch["mask_gt"][bi]
                tp = match_predictions(
                    out["classes"][bi][keep],
                    batch["cls"][bi][gt_keep],
                    out["ious_box"][bi][gt_keep][:, keep],
                )
                metrics.box.update(
                    tp, out["scores"][bi][keep], out["classes"][bi][keep],
                    batch["cls"][bi][gt_keep],
                )
            n_img += images.shape[0]
        metrics.process()
        res = metrics.results_dict
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
        nc = model.nc
        max_det = args.max_det

        @jax.jit
        def eval_fn(variables, images, gt_bboxes):
            pred = model.predict(variables, images)  # (B, 4+nc+nk, A)
            boxes_xywh = pred[:, :4]
            pred = pred.at[:, :4].set(
                jnp.transpose(xywh2xyxy(jnp.transpose(boxes_xywh, (0, 2, 1))), (0, 2, 1))
            )
            out = non_max_suppression(
                pred.astype(jnp.float32), nc=nc, conf_thres=args.conf,
                iou_thres=args.iou, pre_nms=getattr(args, "pre_nms", 1024),
                max_det=max_det,
            )
            gt_xyxy = xywh2xyxy(gt_bboxes) * imgsz
            ious_box = jax.vmap(box_iou)(gt_xyxy, out["boxes"])
            return {**out, "ious_box": ious_box}

        t0 = time.time()
        n_img = 0
        for batch in loader:
            images = jnp.asarray(batch["img"])
            out = eval_fn(variables, images, jnp.asarray(batch["bboxes"]))
            out = {k: np.asarray(v) for k, v in out.items()}
            n_img += images.shape[0]
            for bi in range(images.shape[0]):
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
                    pk = out["extras"][bi][keep].reshape(-1, *kpt_shape)
                    gk = batch["keypoints"][bi][gt_keep].copy()
                    gk[..., 0] *= imgsz
                    gk[..., 1] *= imgsz
                    gb = np.asarray(
                        xywh2xyxy(jnp.asarray(batch["bboxes"][bi][gt_keep])) * imgsz
                    )
                    area = np.clip(
                        (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1]) * 0.53, 1, None
                    )
                    oks = kpt_iou(gk, pk, area, np.asarray(OKS_SIGMA))
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
            dataset = ClassificationDataset(data["val"], imgsz=args.imgsz, augment=False)
            loader = build_dataloader(dataset, args.batch, args.workers, shuffle=False, mode="val")
        metrics = ClassifyMetrics()

        @jax.jit
        def eval_fn(variables, images):
            return model.predict(variables, images)

        t0 = time.time()
        n = 0
        for batch in loader:
            preds = np.asarray(eval_fn(variables, jnp.asarray(batch["img"])))
            metrics.update(preds, np.asarray(batch["cls"]))
            n += preds.shape[0]
        res = metrics.results_dict
        LOGGER.info(
            f"val: {n} imgs  top1 {res['metrics/accuracy_top1']:.4f}  "
            f"top5 {res['metrics/accuracy_top5']:.4f}  ({time.time() - t0:.1f}s)"
        )
        return res
