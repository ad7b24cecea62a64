"""Polar-contour segment task (reference models/yolo/segment/)."""
from ....engine.predictor import SegmentationPredictor
from ....engine.trainer import SegmentationTrainer
from ....engine.validator import SegmentationValidator

__all__ = ["SegmentationPredictor", "SegmentationTrainer", "SegmentationValidator"]
