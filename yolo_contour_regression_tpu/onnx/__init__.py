"""Native ONNX export: hand-rolled protobuf writer + spec-graph emitters.

No dependency on the ``onnx`` package or torch — see proto.py / export.py.
"""
from .builder import GraphBuilder  # noqa: F401
from .export import export_onnx  # noqa: F401
