"""Model family packages. Lazy attribute access — the family modules import
engine classes, and engine.model imports back here to register task maps, so
eager imports would cycle."""


def __getattr__(name):
    if name == "YOLO":
        from .yolo.model import YOLO

        return YOLO
    if name in ("yolo", "rtdetr", "sam", "fastsam", "nas", "utils"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)


__all__ = ["YOLO", "yolo", "rtdetr", "sam", "fastsam", "nas"]
