"""YOLO-NAS model interface.

The reference's NAS class (models/nas/model.py:24-59) is a thin shell that
downloads super-gradients torch checkpoints and reuses the detect
validator/predictor. Those checkpoints are unobtainable/unloadable here, so
this build goes further than the reference: the YOLO-NAS topology itself is
reconstructed natively (cfg/models/yolo_nas.yaml — QARepVGG stem/stages via
RepConv + NASCSP, SPP context, PAN neck, DFL detect head), making NAS models
trainable/exportable like any other family, while keeping the reference's
surface: ``NAS('yolo_nas_s')`` -> detect-task model with predict/val/export.

Pretrained Deci weights can be converted offline with
examples/scripts/convert_torch_ckpt.py into the native .ckpt format and then
loaded with ``NAS('yolo_nas_s.ckpt')``.
"""
from __future__ import annotations

from pathlib import Path

from ...engine.model import YOLO


class NAS(YOLO):
    """YOLO-NAS facade (reference models/nas/model.py:24). Accepts
    'yolo_nas_{s,m,l}' names, the base yaml, or a converted .ckpt."""

    def __init__(self, model: str = "yolo_nas_s"):
        p = Path(str(model))
        if p.suffix in ("", ".yaml", ".yml") and p.stem.startswith("yolo_nas"):
            model = str(p.with_suffix(".yaml"))
        elif p.suffix == ".pt":
            raise NotImplementedError(
                "super-gradients .pt checkpoints are torch pickles; convert "
                "them offline with examples/scripts/convert_torch_ckpt.py "
                "and load the resulting .ckpt"
            )
        super().__init__(model, task="detect")
