"""Classify task (reference models/yolo/classify/)."""
from ....engine.predictor import ClassificationPredictor
from ....engine.trainer import ClassificationTrainer
from ....engine.validator import ClassificationValidator

__all__ = ["ClassificationPredictor", "ClassificationTrainer", "ClassificationValidator"]
