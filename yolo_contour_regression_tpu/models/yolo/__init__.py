from . import classify, detect, pose, segment
from .model import YOLO

__all__ = ["classify", "detect", "pose", "segment", "YOLO"]
