"""FastSAM model handle (reference models/fastsam/model.py): a
class-agnostic segment model whose predictions feed FastSAMPrompt."""
from __future__ import annotations

from ...engine.model import YOLO


class FastSAM(YOLO):
    """Everything-segmentation handle: the polar seg model run class-agnostic
    (single 'object' class, agnostic NMS), producing candidate instances that
    prompts then filter."""

    def __init__(self, model: str = "yolov8s-seg.yaml"):
        super().__init__(model, task="segment")

    def predict(self, source=None, stream: bool = False, **kwargs):
        kwargs.setdefault("agnostic_nms", True)
        kwargs.setdefault("conf", 0.4)
        return super().predict(source, stream=stream, **kwargs)
