"""yolo_contour_regression_tpu — TPU-native polar contour-regression framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference ai4in/YOLO-Contour-Regression (an Ultralytics YOLOv8 8.0.149 fork
replacing prototype-mask segmentation with PolarMask-style 36-ray contour
regression). Public surface mirrors the reference:

    from yolo_contour_regression_tpu import YOLO
    model = YOLO("yolov8n-seg.yaml")
    model.train(data="coco8-seg.yaml", epochs=100, imgsz=640)
    model.val()
    results = model.predict("bus.jpg")
"""

__version__ = "0.1.0"

# Honor the JAX_PLATFORMS env contract even on images whose site hooks
# pre-import jax (which silently voids the env var): mirror it into
# jax.config before any backend is initialized. A dead accelerator tunnel
# otherwise HANGS backend init in every "CPU" script that forgot to pin.
import os as _os  # noqa: E402

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backends already initialized — too late to repin
        pass
del _os


def __getattr__(name):
    # lazy to keep `import yolo_contour_regression_tpu` cheap (jax loads on use)
    if name == "YOLO":
        from .engine.model import YOLO

        return YOLO
    if name == "SETTINGS":
        from .cfg import DEFAULT_CFG_DICT

        return DEFAULT_CFG_DICT
    if name == "NAS":
        from .models.nas import NAS

        return NAS
    if name == "RTDETR":
        from .models.rtdetr import RTDETR

        return RTDETR
    raise AttributeError(name)


__all__ = ["YOLO", "NAS", "RTDETR", "__version__"]
