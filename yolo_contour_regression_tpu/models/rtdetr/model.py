"""RT-DETR model family facade (reference models/rtdetr/model.py)."""
from __future__ import annotations

from ...engine.model import YOLO


class RTDETR(YOLO):
    """RT-DETR handle: YOLO facade bound to the rtdetr task/predictor."""

    def __init__(self, model: str = "rtdetr-l.yaml"):
        super().__init__(model, task="rtdetr")
