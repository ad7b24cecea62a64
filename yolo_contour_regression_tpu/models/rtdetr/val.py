"""RT-DETR validator (reference models/rtdetr/val.py): box mAP without NMS —
all nq queries scored directly."""
from __future__ import annotations

import time
from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...data.utils import check_det_dataset
from ...engine.validator import BaseValidator
from ...ops.boxes import box_iou, scale_boxes, xywh2xyxy
from ...utils import LOGGER
from ...utils.metrics import DetMetrics, match_predictions


class RTDETRValidator(BaseValidator):
    task = "rtdetr"

    def __call__(self, model=None, variables=None, data=None, loader=None) -> Dict[str, float]:
        args = self.args
        if isinstance(data, (str, Path)):
            data = check_det_dataset(data)
        if loader is None:
            loader = self.build_loader(data)
        metrics = DetMetrics(names=getattr(model, "names", {}))
        imgsz = args.imgsz

        def _build():
            def eval_fn(variables, images, gt_bboxes, ori_shape, ratio_pad):
                # unjitted core — _wrap_eval_core jits it single and scanned
                pred = model.predict(variables, images)  # (B, nq, 4+nc) cxcywh norm
                # native-space matching (reference rtdetr/val.py scales to
                # ori_shape), via the shared inverse-letterbox op;
                # per-axis scale supports rect val batches (H != W)
                wh2 = jnp.asarray(
                    [images.shape[2], images.shape[1]] * 2, jnp.float32
                )
                boxes = scale_boxes(xywh2xyxy(pred[..., :4]) * wh2, ratio_pad, ori_shape)
                scores = pred[..., 4:]
                gt_xyxy = scale_boxes(xywh2xyxy(gt_bboxes) * wh2, ratio_pad, ori_shape)
                ious = jax.vmap(box_iou)(gt_xyxy, boxes)
                return {"boxes": boxes, "scores": scores, "ious": ious}

            return eval_fn

        fns = self._wrap_eval_core((id(model), imgsz), _build)

        t0 = time.time()
        n_img = 0
        for batch, out, nv in self._dispatch_eval(
            loader, variables, fns, ("img", "bboxes", "ori_shape", "ratio_pad")
        ):
            boxes, scores, ious = out["boxes"], out["scores"], out["ious"]
            for bi in range(nv):
                conf = scores[bi].max(-1)
                cls = scores[bi].argmax(-1)
                keep = conf >= args.conf
                gt_keep = batch["mask_gt"][bi]
                tp = match_predictions(
                    cls[keep], batch["cls"][bi][gt_keep], ious[bi][gt_keep][:, keep]
                )
                metrics.box.update(tp, conf[keep], cls[keep], batch["cls"][bi][gt_keep])
            n_img += nv
        metrics.process()
        res = metrics.results_dict
        LOGGER.info(
            f"val(rtdetr): {n_img} imgs  box mAP50-95 {res['metrics/mAP50-95(B)']:.4f} "
            f"({time.time() - t0:.1f}s)"
        )
        return res
