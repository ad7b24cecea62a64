"""Exporter — serialize the deploy model for external consumption.

Re-implements the reference Exporter surface (engine/exporter.py:124-994) with
TPU-native artifact formats:

  - ``stablehlo``: ``jax.export`` serialized StableHLO (the portable XLA
    artifact; loadable from C++ via PjRt or back into JAX) — replaces
    TorchScript/engine as the native format.
  - ``saved_model`` / ``tflite``: via jax2tf + the TF toolchain (the
    reference's TF chain, exporter.py:611-787).
  - ``onnx``: gated on the optional onnx package (absent in this image).

Key deliberate improvement over the reference: the exported graph CONTAINS the
polar ray decode (and optionally NMS) — the reference drops both at export
(head.py:572, exporter.py:324), forcing consumers to reimplement them.
Models are fused (structural reparameterization) before export, like the
reference's ``model.fuse()`` step.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg
from ..nn.fuse import fuse_variables
from ..utils import LOGGER

EXPORT_FORMATS = ("stablehlo", "saved_model", "tflite", "onnx")


class Exporter:
    def __init__(self, args=None):
        self.args = args if args is not None else get_cfg()

    def __call__(self, model, variables, fmt: Optional[str] = None) -> str:
        fmt = (fmt or self.args.format or "stablehlo").lower()
        if fmt not in EXPORT_FORMATS:
            raise ValueError(f"format '{fmt}' not in {EXPORT_FORMATS}")
        t0 = time.time()
        imgsz = self.args.imgsz
        batch = getattr(self.args, "batch", 1) or 1

        # fuse for deploy (reference exporter.py:147 model.fuse())
        variables, model = fuse_variables(model, variables)

        include_nms = bool(getattr(self.args, "nms", False))
        nc = model.nc

        def infer(variables, x):
            pred = model.predict(variables, x)
            if not include_nms:
                return pred
            from ..ops.nms import non_max_suppression

            out = non_max_suppression(
                pred.astype(jnp.float32), nc=nc,
                conf_thres=self.args.conf or 0.25, iou_thres=self.args.iou,
                pre_nms=getattr(self.args, "pre_nms", 1024),
                max_det=self.args.max_det,
            )
            return out["boxes"], out["scores"], out["classes"], out["extras"], out["valid"]

        x_spec = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
        name = Path(str(self.args.model or f"yolov8-{model.task}")).stem
        out_dir = Path(self.args.project or ".")
        out_dir.mkdir(parents=True, exist_ok=True)

        metadata = {
            "description": f"{name} ({model.task}) TPU-native export",
            "task": model.task,
            "imgsz": imgsz,
            "batch": batch,
            "nc": nc,
            "names": getattr(model, "names", {}),
            "strides": list(model.strides),
            "decode_in_graph": True,
            "nms_in_graph": include_nms,
            "layout": "NHWC, RGB, float32 in [0,1]",
            "output": (
                "(B, 4+nc+108, A): xyxy box | nc scores | 36 seg-x | 36 seg-y | 36 valid"
                if model.task == "segment"
                else "(B, 4+nc, A): xywh box | nc scores"
            ),
        }

        if fmt == "stablehlo":
            from jax import export as jexport

            fn = jax.jit(lambda v, x: infer(v, x))
            exp = jexport.export(fn)(
                jax.tree_util.tree_map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
                ),
                x_spec,
            )
            path = out_dir / f"{name}.stablehlo"
            path.write_bytes(exp.serialize())
            # weights travel alongside (stablehlo holds the graph only)
            import pickle

            with open(out_dir / f"{name}.weights.pkl", "wb") as fh:
                pickle.dump(
                    jax.tree_util.tree_map(np.asarray, variables), fh,
                    protocol=pickle.HIGHEST_PROTOCOL,
                )
        elif fmt in ("saved_model", "tflite"):
            import tensorflow as tf
            from jax.experimental import jax2tf

            const_vars = jax.tree_util.tree_map(np.asarray, variables)
            tf_fn = jax2tf.convert(
                lambda x: infer(const_vars, x), with_gradient=False
            )
            module = tf.Module()
            module.f = tf.function(
                tf_fn,
                input_signature=[tf.TensorSpec((batch, imgsz, imgsz, 3), tf.float32)],
                autograph=False,
            )
            sm_path = out_dir / f"{name}_saved_model"
            tf.saved_model.save(module, str(sm_path))
            path = sm_path
            if fmt == "tflite":
                conv = tf.lite.TFLiteConverter.from_saved_model(str(sm_path))
                conv.target_spec.supported_ops = [
                    tf.lite.OpsSet.TFLITE_BUILTINS,
                    tf.lite.OpsSet.SELECT_TF_OPS,
                ]
                tfl = conv.convert()
                path = out_dir / f"{name}.tflite"
                path.write_bytes(tfl)
        else:  # onnx: saved_model -> tf2onnx (reference exporter.py:324-394)
            # Recipe when tf2onnx/onnx are unavailable in the runtime image
            # (zero-egress): export format='saved_model' here, then on any
            # machine with the packages:
            #   python -m tf2onnx.convert --saved-model <dir> --output m.onnx \
            #       --opset 12 --rename-outputs output0
            # The graph already contains the polar decode (and NMS when
            # nms=True), so the ONNX consumer needs no custom postprocess
            # beyond thresholding — unlike the reference, which drops decode
            # at export (head.py:572) and makes consumers reimplement it.
            try:
                import onnx  # noqa: F401
                import tf2onnx
            except ImportError as e:
                raise ImportError(
                    "onnx export needs the 'onnx' + 'tf2onnx' packages (absent "
                    "in this environment); use format='saved_model' and run "
                    "tf2onnx offline — see the recipe in engine/exporter.py"
                ) from e
            import tensorflow as tf
            from jax.experimental import jax2tf

            const_vars = jax.tree_util.tree_map(np.asarray, variables)
            tf_fn = jax2tf.convert(lambda x: infer(const_vars, x), with_gradient=False)
            spec = tf.TensorSpec((batch, imgsz, imgsz, 3), tf.float32, name="images")
            func = tf.function(tf_fn, input_signature=[spec], autograph=False)
            path = out_dir / f"{name}.onnx"
            onnx_model, _ = tf2onnx.convert.from_function(
                func,
                input_signature=[spec],
                opset=int(getattr(self.args, "opset", None) or 12),
                output_path=str(path),
            )
            # reference output naming: output0 (+ output1 for seg protos;
            # the polar graph is single-output with contours inline)
            import onnx as onnx_mod

            m = onnx_mod.load(str(path))
            for i, o in enumerate(m.graph.output):
                # record original->canonical mapping in metadata_props
                entry = m.metadata_props.add()
                entry.key = f"output{i}"
                entry.value = o.name
            for k, v in metadata.items():
                entry = m.metadata_props.add()
                entry.key = str(k)
                entry.value = json.dumps(v, default=str)
            onnx_mod.save(m, str(path))

        with open(out_dir / f"{name}.metadata.json", "w") as fh:
            json.dump(metadata, fh, indent=2, default=str)
        LOGGER.info(f"export {fmt} -> {path} ({time.time() - t0:.1f}s)")
        return str(path)


def dump_prediction(pred, nc: int, height: int, width: int, path: str,
                    conf: float = 0.25, iou: float = 0.7):
    """Write one image's raw prediction tensor in the C++ demo's binary
    format (examples/polar-seg-cpp/main.cpp): header int32[nc, A, h, w] +
    float32[conf, iou] + channel-major float32 prediction."""
    import struct

    pred = np.asarray(pred, np.float32)
    if pred.ndim == 3:
        pred = pred[0]
    C, A = pred.shape
    assert C == 4 + nc + 108, f"expected polar layout, got C={C} nc={nc}"
    with open(path, "wb") as fh:
        fh.write(struct.pack("<iiii", nc, A, height, width))
        fh.write(struct.pack("<ff", conf, iou))
        fh.write(pred.tobytes())
    return path


def load_stablehlo(path: str, weights_path: Optional[str] = None):
    """Reload an exported artifact: returns fn(x) -> outputs."""
    import pickle

    from jax import export as jexport

    exp = jexport.deserialize(Path(path).read_bytes())
    wpath = weights_path or str(Path(path).with_suffix("")) + ".weights.pkl"
    with open(wpath, "rb") as fh:
        variables = pickle.load(fh)

    def fn(x):
        return exp.call(variables, x)

    return fn
