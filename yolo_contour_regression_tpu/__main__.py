"""``python -m yolo_contour_regression_tpu`` == the ``yolo`` CLI."""
import sys

from .cfg import entrypoint

if __name__ == "__main__":
    sys.exit(entrypoint() or 0)
