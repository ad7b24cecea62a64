"""Auto-annotation (reference data/annotator.py:6-48 auto_annotate: a
detector proposes boxes, SAM refines them into masks). Two modes:

- default: the polar path gives contours directly from the detector, so
  labels are written straight from polar-seg predictions — no second model.
- ``sam_model=``: reference-style refinement — each detector box becomes a
  SAM box prompt and the best-IoU mask's largest contour is written instead
  (useful when the detector is boxes-only or the polar 36-gon is too coarse).
"""
from __future__ import annotations

from pathlib import Path


def _sam_contour(predictor, box, orig_shape):
    """Box prompt -> best mask -> largest outer contour (N, 2) px, or None."""
    import cv2
    import numpy as np

    masks, iou = predictor.predict(box=np.asarray(box, np.float32),
                                   multimask_output=True)
    best = masks[int(np.argmax(iou))].astype(np.uint8)
    contours, _ = cv2.findContours(best, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return None
    return max(contours, key=cv2.contourArea).reshape(-1, 2)


def auto_annotate(data, det_model="yolov8n-seg.yaml", sam_model=None,
                  output_dir=None, conf=0.25, imgsz=640):
    """Run the detector over a folder and write YOLO polygon labels. With
    ``sam_model`` (a SAM variant name, ``.pt``/``.pth`` checkpoint path, or a
    built ``Sam`` instance), detector boxes are refined into SAM masks
    (reference data/annotator.py flow); otherwise polar contours are used."""
    from ..engine.model import YOLO

    model = YOLO(det_model)
    predictor = None
    if sam_model is not None:
        from ..models.sam import Predictor

        if hasattr(sam_model, "decode_prompts"):  # a built Sam (or compatible)
            sam = sam_model
        else:
            from ..models.sam.model import SAM

            sam = SAM(sam_model).model
        predictor = Predictor(sam)
    out = Path(output_dir or (Path(data).parent / f"{Path(data).stem}_auto_annotate_labels"))
    out.mkdir(parents=True, exist_ok=True)
    for res in model.predict(str(data), stream=True, conf=conf, imgsz=imgsz):
        h, w = res.orig_shape
        lines = []
        if predictor is not None and res.boxes is not None and len(res.boxes.cls):
            import cv2

            img = res.orig_img
            if img is None and res.path:
                img = cv2.imread(str(res.path))
            predictor.set_image(img)
            for box, cls in zip(res.boxes.xyxy, res.boxes.cls):
                pts = _sam_contour(predictor, box, (h, w))
                if pts is not None and pts.shape[0] >= 3:
                    vals = " ".join(f"{x / w:.5f} {y / h:.5f}" for x, y in pts)
                    lines.append(f"{int(cls)} {vals}")
        elif res.contours is not None and res.boxes is not None:
            for pts, cls in zip(res.contours.xy, res.boxes.cls):
                if pts.shape[0] >= 3:
                    vals = " ".join(f"{x / w:.5f} {y / h:.5f}" for x, y in pts)
                    lines.append(f"{int(cls)} {vals}")
        (out / (Path(str(res.path)).stem + ".txt")).write_text("\n".join(lines))
    return str(out)
