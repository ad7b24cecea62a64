"""Production serving for TPU inference (beyond-reference subsystem).

The reference repo (ai4in/YOLO-Contour-Regression) ships batch-1 streaming
prediction only (ultralytics/engine/predictor.py stream_inference); its
deployment story is "export to TensorRT/ONNX and bring your own server".
On TPU the chip's throughput comes almost entirely from batching (one v5e
chip: ~300 img/s at batch 1 vs ~7500 img/s at batch 128 for yolov8n-seg,
bench.py), so a server that coalesces concurrent requests into padded
fixed-shape batches is the difference between wasting and using the MXU.

``InferenceServer`` is that server: a dynamic-batching engine with
static shape buckets (compile once per bucket — XLA retraces on any new
batch size, so arbitrary batch shapes are a recompile storm), a single
dispatcher thread owning all device dispatch, and per-request futures.
``serve.http_api`` adds an optional stdlib HTTP frontend.
"""
from .server import InferenceServer, ServerStats

__all__ = ["InferenceServer", "ServerStats"]
