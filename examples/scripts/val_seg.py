"""Validate a trained polar-seg checkpoint (reference val_seg_car.py)."""
from yolo_contour_regression_tpu import YOLO

if __name__ == "__main__":
    model = YOLO("runs/segment_train/weights/last.ckpt")
    print(model.val(imgsz=640, batch=32))
