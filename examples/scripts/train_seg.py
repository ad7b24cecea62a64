"""Polar-seg training entry (reference top-level train_seg_car.py)."""
from yolo_contour_regression_tpu import YOLO

if __name__ == "__main__":
    model = YOLO("yolov8n-seg.yaml")
    model.train(
        data="bdd100k.yaml", epochs=300, task="segment", mixup=0.0, mosaic=1.0,
        imgsz=640, batch=32,
    )
