"""RT-DETR task package (reference models/rtdetr/). Lazy attribute access
avoids a circular import with engine.model (which registers our task map
entries at import time)."""


def __getattr__(name):
    if name == "RTDETR":
        from .model import RTDETR

        return RTDETR
    if name == "RTDETRPredictor":
        from .predict import RTDETRPredictor

        return RTDETRPredictor
    if name == "RTDETRValidator":
        from .val import RTDETRValidator

        return RTDETRValidator
    raise AttributeError(name)


__all__ = ["RTDETR", "RTDETRPredictor", "RTDETRValidator"]
