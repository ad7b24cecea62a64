"""Auto-annotation (reference data/annotator.py:6 auto_annotate: detector
proposes boxes, SAM refines masks). SAM is not yet ported (round-2 scope);
the polar path gives contours directly from the detector, so auto-annotation
here writes YOLO polygon labels straight from polar-seg predictions."""
from __future__ import annotations

from pathlib import Path


def auto_annotate(data, det_model="yolov8n-seg.yaml", output_dir=None, conf=0.25, imgsz=640):
    """Run the polar-seg model over a folder and write YOLO polygon labels."""
    from ..engine.model import YOLO

    model = YOLO(det_model)
    out = Path(output_dir or (Path(data).parent / f"{Path(data).stem}_auto_annotate_labels"))
    out.mkdir(parents=True, exist_ok=True)
    for res in model.predict(str(data), stream=True, conf=conf, imgsz=imgsz):
        h, w = res.orig_shape
        lines = []
        if res.contours is not None and res.boxes is not None:
            for pts, cls in zip(res.contours.xy, res.boxes.cls):
                if pts.shape[0] >= 3:
                    vals = " ".join(f"{x / w:.5f} {y / h:.5f}" for x, y in pts)
                    lines.append(f"{int(cls)} {vals}")
        (out / (Path(str(res.path)).stem + ".txt")).write_text("\n".join(lines))
    return str(out)
