"""Pose task (reference models/yolo/pose/)."""
from ....engine.predictor import PosePredictor
from ....engine.trainer import PoseTrainer
from ....engine.validator import PoseValidator

__all__ = ["PosePredictor", "PoseTrainer", "PoseValidator"]
