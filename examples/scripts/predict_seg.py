"""Streaming polar-seg prediction (reference predict_seg.py)."""
from yolo_contour_regression_tpu import YOLO

if __name__ == "__main__":
    model = YOLO("runs/segment_train/weights/best.ckpt")
    for res in model.predict("data/images", stream=True, conf=0.5):
        print(res.path, len(res), "instances")
