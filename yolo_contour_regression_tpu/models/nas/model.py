"""YOLO-NAS wrapper (reference models/nas/, 126 LoC: a thin shell around
super-gradients pretrained checkpoints). Those checkpoints are torch pickles
served from Deci's CDN — unreachable and unloadable here; the class keeps the
API surface and raises with guidance."""
from __future__ import annotations


class NAS:
    def __init__(self, model: str = "yolo_nas_s.pt"):
        raise NotImplementedError(
            "YOLO-NAS depends on super-gradients pretrained torch checkpoints, "
            "which cannot be fetched or deserialized in this TPU environment. "
            "Use YOLO('yolov8n.yaml') for an equivalent-scale detector, or "
            "convert NAS weights offline into this framework's .ckpt format."
        )
