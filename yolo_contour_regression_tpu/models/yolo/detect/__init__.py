"""Detect task (reference models/yolo/detect/)."""
from ....engine.predictor import BasePredictor as DetectionPredictor
from ....engine.trainer import DetectionTrainer
from ....engine.validator import DetectionValidator

__all__ = ["DetectionPredictor", "DetectionTrainer", "DetectionValidator"]
