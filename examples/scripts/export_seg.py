"""Export the deploy artifact (reference export_catseg.py: onnx opset12;
here StableHLO with decode in-graph)."""
from yolo_contour_regression_tpu import YOLO

if __name__ == "__main__":
    model = YOLO("runs/segment_train/weights/best.ckpt")
    print(model.export(format="stablehlo", imgsz=640))
