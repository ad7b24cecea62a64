"""Task map home (reference models/yolo/model.py:14-36): the YOLO class with
its per-task {model, trainer, validator, predictor} wiring lives in
engine.model; re-exported here for API parity."""
from ...engine.model import TASK_MAP, YOLO

__all__ = ["YOLO", "TASK_MAP"]
