from .yolo.model import YOLO  # re-export (reference models/__init__.py)

__all__ = ["YOLO"]
