"""Prompt-based selection over everything-segmentation results.

Re-implementation of the reference ``models/fastsam/prompt.py`` (:12
FastSAMPrompt): ``box_prompt`` (max-IoU mask vs prompt box), ``point_prompt``
(masks containing foreground points minus background points),
``everything_prompt`` (all masks), ``text_prompt`` (CLIP-gated; raises with
instructions in this CLIP-less image).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class FastSAMPrompt:
    def __init__(self, img, results):
        self.img = img
        self.results = results  # list[Results] from FastSAM.predict
        self.res = results[0] if isinstance(results, (list, tuple)) else results

    def _masks(self) -> np.ndarray:
        if self.res.masks is not None:
            return np.asarray(self.res.masks.data).astype(bool)
        # rasterize from contours lazily if predictor skipped masks
        if self.res.contours is not None and len(self.res.contours):
            import jax.numpy as jnp

            from ...ops.raster import fill_polygons

            h, w = self.res.orig_shape
            return np.asarray(
                fill_polygons(
                    jnp.asarray(self.res.contours.points),
                    jnp.asarray(self.res.contours.valid),
                    h, w,
                )
            )
        h, w = self.res.orig_shape
        return np.zeros((0, h, w), bool)

    def everything_prompt(self) -> np.ndarray:
        """(n, H, W) all candidate masks (reference prompt.py:405)."""
        return self._masks()

    def box_prompt(self, bbox: Sequence[float]) -> np.ndarray:
        """Select the mask with max IoU against the prompt box
        (reference prompt.py:344)."""
        masks = self._masks()
        if masks.shape[0] == 0:
            return masks
        x1, y1, x2, y2 = (int(v) for v in bbox)
        box_area = max((x2 - x1) * (y2 - y1), 1)
        inter = masks[:, y1:y2, x1:x2].sum((1, 2))
        union = masks.sum((1, 2)) + box_area - inter
        iou = inter / np.maximum(union, 1)
        return masks[iou.argmax()][None]

    def point_prompt(self, points: Sequence[Sequence[float]], pointlabel: Sequence[int]) -> np.ndarray:
        """Union of masks containing fg points, minus masks containing bg
        points (reference prompt.py:375)."""
        masks = self._masks()
        if masks.shape[0] == 0:
            return masks
        h, w = masks.shape[1:]
        on = np.zeros((h, w), bool)
        for (x, y), lab in zip(points, pointlabel):
            xi, yi = int(np.clip(x, 0, w - 1)), int(np.clip(y, 0, h - 1))
            hit = masks[:, yi, xi]
            if lab == 1:
                on |= masks[hit].any(0) if hit.any() else False
            else:
                on &= ~(masks[hit].any(0) if hit.any() else False)
        return on[None]

    def text_prompt(self, text: str):
        raise ImportError(
            "text_prompt needs a CLIP model, which is not available in this "
            "image; use box_prompt/point_prompt/everything_prompt"
        )

    def plot(self, output_path: Optional[str] = None, masks: Optional[np.ndarray] = None):
        """Overlay selected masks on the image (reference prompt.py:95)."""
        import cv2

        from ...utils.plotting import Annotator, colors

        ann = Annotator(np.asarray(self.img).copy())
        m = self._masks() if masks is None else masks
        ann.masks(m, [colors(i, True) for i in range(m.shape[0])])
        out = ann.result()
        if output_path:
            cv2.imwrite(output_path, out)
        return out
