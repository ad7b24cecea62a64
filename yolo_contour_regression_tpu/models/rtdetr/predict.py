"""RT-DETR predictor (reference models/rtdetr/predict.py): no NMS — queries
above conf are kept; boxes are normalized cxcywh."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...engine.predictor import BasePredictor
from ...engine.results import Results


class RTDETRPredictor(BasePredictor):
    task = "rtdetr"

    def _build_eval(self, model):
        from ...engine.predictor import _as_float

        @jax.jit
        def eval_fn(variables, images):
            return model.predict(variables, _as_float(images))  # (B, nq, 4+nc)

        return eval_fn

    def postprocess(self, pred, bi, orig, path, gain, pad, names):
        p = np.asarray(pred)[bi]  # (nq, 4+nc)
        boxes_n, scores_all = p[:, :4], p[:, 4:]
        conf = scores_all.max(-1)
        cls = scores_all.argmax(-1)
        keep = conf >= (self.args.conf or 0.25)
        h, w = orig.shape[:2]
        imgsz = self.args.imgsz
        cxcywh = boxes_n[keep] * imgsz
        xyxy = np.concatenate(
            [cxcywh[:, :2] - cxcywh[:, 2:] / 2, cxcywh[:, :2] + cxcywh[:, 2:] / 2], -1
        )
        xyxy = (xyxy - np.array([pad[0], pad[1], pad[0], pad[1]])) / gain
        xyxy = np.clip(xyxy, 0, [w, h, w, h])
        data = np.concatenate([xyxy, conf[keep, None], cls[keep, None]], -1)
        return Results(orig, path, names, boxes=data)

    def _stream(self, model, variables, source, names):
        import time

        from ...engine.predictor import iter_source

        if self._eval_fn is None:
            self._eval_fn = self._build_eval(model)
        for path, orig in iter_source(source):
            t0 = time.perf_counter()
            x, gain, pad = self.preprocess_u8(orig, self.args.imgsz)
            pred = self._eval_fn(variables, jnp.asarray(x)[None])
            res = self.postprocess(pred, 0, orig, path, gain, pad, names)
            res.speed = {"total": (time.perf_counter() - t0) * 1e3}
            yield res
