"""AutoBackend — uniform inference across artifact formats.

Re-implementation of the reference ``nn/autobackend.py`` (493 LoC): one
``forward(im)`` over whatever artifact the user hands in, detected by suffix:

  - ``.ckpt``      native checkpoint -> fused jitted predict
  - ``.yaml``      fresh model (random weights) -> jitted predict
  - ``.stablehlo`` jax.export artifact (+ sibling .weights.pkl)
  - ``_saved_model`` / ``.pb`` / ``.tflite``  TF artifacts (gated on
    tensorflow); quantized tflite I/O (int8 in/out tensors) handled via the
    tensors' quantization params

The reference's TensorRT/CoreML/paddle/ncnn/triton branches have no
TPU-image equivalent and raise informative errors; edgetpu-compiled tflite
needs the libedgetpu delegate (raises with guidance when absent).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..utils import LOGGER


class AutoBackend:
    def __init__(self, weights: str, fuse: bool = True):
        self.path = str(weights)
        p = Path(self.path)
        self.metadata: Dict = {}
        suffix = p.suffix.lower()
        self.fmt = (
            "saved_model" if p.name.endswith("_saved_model") or (p / "saved_model.pb").exists()
            else {".ckpt": "ckpt", ".yaml": "yaml", ".yml": "yaml",
                  ".stablehlo": "stablehlo", ".tflite": "tflite",
                  ".onnx": "onnx", ".pt": "pt", ".pb": "pb"}.get(suffix)
        )
        if self.fmt is None:
            raise ValueError(
                f"unsupported artifact '{weights}' — supported: .ckpt, .yaml, "
                ".pt (converted via utils/torch_convert), .onnx (needs "
                "onnxruntime), .stablehlo, _saved_model dir, .pb, .tflite "
                "(tensorrt/coreml have no backend in this environment)"
            )
        meta_path = p.with_suffix("").with_suffix("") if suffix else p
        for cand in (p.parent / f"{p.stem}.metadata.json", Path(str(p) + ".metadata.json")):
            if cand.exists():
                import json

                self.metadata = json.loads(cand.read_text())
                break
        getattr(self, f"_init_{self.fmt}")()
        LOGGER.info(f"AutoBackend: {self.fmt} <- {weights}")

    # -- per-format init ----------------------------------------------------
    def _init_ckpt(self):
        from ..engine.model import YOLO
        from ..nn.fuse import fuse_variables

        handle = YOLO(self.path)
        variables, model = fuse_variables(handle.model, handle.variables)
        self.names = handle.names
        import jax

        self._fn = jax.jit(lambda x: model.predict(variables, x))

    def _init_yaml(self):
        import jax

        from ..nn.tasks import build_model

        model = build_model(self.path)
        variables = model.init()
        self.names = model.names
        self._fn = jax.jit(lambda x: model.predict(variables, x))

    def _init_onnx(self):
        """ONNX: onnxruntime when installed, else OpenCV-DNN (the consumer the
        reference's C++ example uses, examples/YOLOv8-CPP-Inference). Native
        onnx exports are NCHW (onnx/export.py); forward() keeps the NHWC
        contract and transposes here."""
        nchw = "NCHW" in str(self.metadata.get("layout", "NCHW"))

        def to_input(x):
            x = np.asarray(x, np.float32)
            return x.transpose(0, 3, 1, 2).copy() if nchw and x.ndim == 4 else x

        try:
            import onnxruntime as ort

            sess = ort.InferenceSession(
                self.path, providers=["CPUExecutionProvider"]
            )
            inp = sess.get_inputs()[0].name

            def fn(x):
                out = sess.run(None, {inp: to_input(x)})
                return out[0] if len(out) == 1 else out

        except ImportError:
            import cv2

            net = cv2.dnn.readNetFromONNX(self.path)

            def fn(x):
                net.setInput(to_input(x))
                return net.forward()

        self._fn = fn
        self.names = self.metadata.get("names", {})

    def _init_pt(self):
        """Reference torch checkpoints: converted on the fly
        (utils/torch_convert) then run through the native fused path."""
        from ..utils.torch_convert import convert_torch_checkpoint

        yaml_guess = self.metadata.get("model_yaml") or "yolov8n-seg.yaml"
        ckpt_path, _ = convert_torch_checkpoint(self.path, yaml_guess)
        self.path = str(ckpt_path)
        self._init_ckpt()

    def _init_stablehlo(self):
        from ..engine.exporter import load_stablehlo

        self._fn = load_stablehlo(self.path)
        self.names = self.metadata.get("names", {})

    def _init_saved_model(self):
        import tensorflow as tf

        self._tf = tf.saved_model.load(self.path)
        self._fn = lambda x: np.asarray(self._tf.f(tf.constant(np.asarray(x))))
        self.names = self.metadata.get("names", {})

    def _init_pb(self):
        """Frozen TF GraphDef (exporter fmt='pb'): import the graph and wrap
        it as a concrete function. Input = the graph's Placeholder node;
        outputs = nodes nothing else consumes (the reference autobackend's
        gd_outputs heuristic, reference nn/autobackend.py:217-228)."""
        import tensorflow as tf

        gd = tf.compat.v1.GraphDef()
        gd.ParseFromString(Path(self.path).read_bytes())
        inputs = [n.name for n in gd.node if n.op == "Placeholder"]
        consumed = {i.split(":")[0].lstrip("^") for n in gd.node for i in n.input}
        outputs = [
            n.name for n in gd.node
            if n.name not in consumed and n.op not in ("Placeholder", "NoOp", "Const")
        ]
        if not inputs or not outputs:
            raise ValueError(f"frozen graph {self.path}: no Placeholder/terminal nodes")

        def _import():
            tf.compat.v1.import_graph_def(gd, name="")

        wrapped = tf.compat.v1.wrap_function(_import, [])
        fetch = wrapped.prune(
            feeds=f"{inputs[0]}:0", fetches=[f"{o}:0" for o in outputs]
        )

        def fn(x):
            res = [np.asarray(r) for r in fetch(tf.constant(np.asarray(x, np.float32)))]
            return res[0] if len(res) == 1 else res

        self._fn = fn
        self.names = self.metadata.get("names", {})

    def _init_tflite(self):
        import tensorflow as tf

        if self.path.endswith("_edgetpu.tflite"):
            # Coral-compiled artifact: the graph is one custom edgetpu op that
            # only the libedgetpu delegate can execute
            try:
                delegate = tf.lite.experimental.load_delegate("libedgetpu.so.1")
            except (ValueError, OSError) as e:
                raise RuntimeError(
                    f"{self.path} is edgetpu-compiled — needs a Coral device +"
                    " libedgetpu; run the '_int8.tflite' precursor here instead"
                ) from e
            interp = tf.lite.Interpreter(
                model_path=self.path, experimental_delegates=[delegate]
            )
        else:
            interp = tf.lite.Interpreter(model_path=self.path)
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        outs = interp.get_output_details()

        def fn(x):
            x = np.asarray(x, np.float32)
            if inp["dtype"] != np.float32:  # quantized-I/O tflite (int8/uint8)
                scale, zero = inp["quantization"]
                info = np.iinfo(inp["dtype"])
                x = np.clip(np.round(x / scale + zero), info.min, info.max).astype(
                    inp["dtype"]
                )
            interp.set_tensor(inp["index"], x)
            interp.invoke()
            res = []
            for o in outs:
                y = interp.get_tensor(o["index"])
                if o["dtype"] != np.float32:
                    scale, zero = o["quantization"]
                    y = (y.astype(np.float32) - zero) * scale
                res.append(y)
            return res[0] if len(res) == 1 else res

        self._fn = fn
        self.names = self.metadata.get("names", {})

    # -- uniform forward ------------------------------------------------------
    def forward(self, im):
        """im (B, H, W, 3) float32 RGB in [0,1] -> prediction tensor."""
        return self._fn(im)

    __call__ = forward
