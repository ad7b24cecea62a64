"""Exporter — serialize the deploy model for external consumption.

Re-implements the reference Exporter surface (engine/exporter.py:124-994) with
TPU-native artifact formats:

  - ``stablehlo``: ``jax.export`` serialized StableHLO (the portable XLA
    artifact; loadable from C++ via PjRt or back into JAX) — replaces
    TorchScript/engine as the native format.
  - ``saved_model`` / ``tflite``: via jax2tf + the TF toolchain (the
    reference's TF chain, exporter.py:611-787).
  - ``onnx``: NATIVE writer (onnx/export.py) — hand-rolled opset-12
    protobuf emitted straight from the fused param tree; no torch, no onnx
    package needed. Validated against OpenCV-DNN (tests/test_onnx_export.py).
  - ``pb``: frozen TF GraphDef; ``edgetpu``: int8 tflite + the Coral
    compiler pass (run here when ``edgetpu_compiler`` is on PATH, else the
    precursor + recipe). The remaining reference formats (tfjs, openvino,
    coreml, engine/TensorRT, paddle, ncnn, torchscript) are accepted and
    SDK-gated: converted when the vendor package exists, otherwise they raise
    with the documented offline recipe over an artifact produced here
    (OFFLINE_RECIPES).

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

EXPORT_FORMATS = ("stablehlo", "saved_model", "tflite", "onnx", "pb", "edgetpu")

# Reference formats (engine/exporter.py export_formats table) whose vendor
# toolchains are not in this image. Each is accepted, gated on its SDK where a
# conversion is mechanical, and otherwise raises with the offline recipe a
# user runs on a machine that has the SDK. The input artifact for every recipe
# is produced by THIS exporter (saved_model / onnx / int8 tflite).
OFFLINE_RECIPES = {
    "tfjs": "pip install tensorflowjs; export format='saved_model', then: "
            "tensorflowjs_converter --input_format=tf_saved_model "
            "<name>_saved_model <out_dir>",
    "openvino": "pip install openvino; export format='onnx', then: "
                "ovc <name>.onnx --output_model <name>_openvino/",
    "coreml": "pip install coremltools (macOS); export format='saved_model', "
              "then: ct.convert('<name>_saved_model', source='tensorflow')",
    "engine": "on a CUDA machine with TensorRT: export format='onnx', then: "
              "trtexec --onnx=<name>.onnx --saveEngine=<name>.engine --fp16",
    "paddle": "pip install x2paddle; export format='onnx', then: x2paddle "
              "--framework=onnx --model=<name>.onnx --save_dir=<name>_paddle",
    "ncnn": "build ncnn's onnx2ncnn, then: onnx2ncnn <name>.onnx "
            "<name>.param <name>.bin",
    "torchscript": "no equivalent: the deploy-portable XLA artifact here is "
                   "format='stablehlo' (loadable from C++ via PjRt)",
}


class Exporter:
    def __init__(self, args=None):
        self.args = args if args is not None else get_cfg()

    def __call__(self, model, variables, fmt: Optional[str] = None) -> str:
        fmt = (fmt or self.args.format or "stablehlo").lower()
        if fmt in ("tfjs", "openvino"):
            return self._sdk_convert(fmt, model, variables)
        if fmt in OFFLINE_RECIPES:
            raise NotImplementedError(
                f"format '{fmt}' needs a vendor toolchain absent from this "
                f"image. Offline recipe: {OFFLINE_RECIPES[fmt]}"
            )
        if fmt not in EXPORT_FORMATS:
            raise ValueError(f"format '{fmt}' not in {EXPORT_FORMATS}")
        t0 = time.time()
        imgsz = self.args.imgsz
        batch = getattr(self.args, "batch", 1) or 1

        # fuse for deploy (reference exporter.py:147 model.fuse()); no-op if
        # the handle is already in deploy state (fuse_variables is idempotent)
        if getattr(model, "quantized", False):
            raise RuntimeError(
                "export of a native-int8 handle is not supported: format "
                "emitters expect f32 deploy kernels. Export the fp32 "
                "checkpoint instead (use format='tflite', int8=True for a "
                "quantized artifact, or keep the native int8 ckpt for "
                "in-framework serving)."
            )
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
        elif fmt in ("saved_model", "tflite", "pb", "edgetpu"):
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
            if fmt == "pb":
                # frozen GraphDef (reference exporter.py export_pb): jax2tf
                # already baked the weights in as constants, so freezing is a
                # structural step, not a capture
                from tensorflow.python.framework.convert_to_constants import (
                    convert_variables_to_constants_v2,
                )

                frozen = convert_variables_to_constants_v2(
                    module.f.get_concrete_function()
                )
                path = out_dir / f"{name}.pb"
                tf.io.write_graph(
                    frozen.graph, str(out_dir), f"{name}.pb", as_text=False
                )
            if fmt in ("tflite", "edgetpu"):
                conv = tf.lite.TFLiteConverter.from_saved_model(str(sm_path))
                conv.target_spec.supported_ops = [
                    tf.lite.OpsSet.TFLITE_BUILTINS,
                    tf.lite.OpsSet.SELECT_TF_OPS,
                ]
                suffix = ""
                if fmt == "edgetpu" or bool(getattr(self.args, "int8", False)):
                    # post-training full-int8 quantization (reference
                    # exporter.py:611-707 int8=True): calibrates on random
                    # letterbox-range data unless the caller passes
                    # args.int8_data (an iterable of (1,S,S,3) float arrays)
                    conv.optimizations = [tf.lite.Optimize.DEFAULT]
                    rep = getattr(self.args, "int8_data", None)

                    def representative():
                        import numpy as _np

                        if rep is not None:
                            for a in rep:
                                yield [a.astype(_np.float32)]
                        else:
                            r = _np.random.default_rng(0)
                            for _ in range(32):
                                yield [r.uniform(
                                    0, 1, (batch, imgsz, imgsz, 3)
                                ).astype(_np.float32)]

                    conv.representative_dataset = representative
                    suffix = "_int8"
                elif bool(getattr(self.args, "half", False)):
                    # fp16 weight quantization (reference half=True)
                    conv.optimizations = [tf.lite.Optimize.DEFAULT]
                    conv.target_spec.supported_types = [tf.float16]
                    suffix = "_fp16"
                tfl = conv.convert()
                path = out_dir / f"{name}{suffix}.tflite"
                path.write_bytes(tfl)
                if fmt == "edgetpu":
                    # reference exporter.py export_edgetpu: the Coral step is
                    # one CLI pass over the int8 artifact
                    import shutil as _shutil
                    import subprocess

                    compiler = _shutil.which("edgetpu_compiler")
                    if compiler:
                        subprocess.run(
                            [compiler, "-s", "-o", str(out_dir), str(path)],
                            check=True,
                        )
                        path = out_dir / f"{path.stem}_edgetpu.tflite"
                    else:
                        LOGGER.warning(
                            f"edgetpu_compiler not on PATH — produced the "
                            f"int8 precursor {path}; finish on a machine with "
                            f"the Coral compiler: edgetpu_compiler -s {path.name}"
                        )
        else:  # onnx — native writer, no torch/onnx-package dependency
            # The graph is emitted directly from the fused param tree by
            # onnx/export.py (hand-rolled protobuf, opset 12, decode
            # in-graph), mirroring the reference's primary deploy artifact
            # (reference engine/exporter.py:324-394) without its torch
            # dependency. Layout follows the ONNX ecosystem convention:
            # input 'images' is (1, 3, imgsz, imgsz) NCHW RGB float in [0,1].
            # NMS stays outside the graph (like the reference's ONNX);
            # consumers use the C++/OpenCV postprocess from
            # examples/polar-seg-cpp or ops/nms.py.
            if include_nms:
                LOGGER.warning(
                    "onnx export carries decode in-graph but not NMS; "
                    "ignoring nms=True (use stablehlo/saved_model for "
                    "NMS-in-graph)"
                )
            from ..onnx.export import export_onnx

            path = out_dir / f"{name}.onnx"
            try:
                export_onnx(
                    model, variables, str(path), imgsz=imgsz,
                    metadata={k: json.dumps(v, default=str)
                              for k, v in metadata.items()},
                )
                # native emitter takes NCHW input (AutoBackend keys its
                # transpose on the 'NCHW' substring)
                metadata["layout"] = "NCHW, RGB, float32 in [0,1]"
            except NotImplementedError:
                # rtdetr & friends: fall back to the tf2onnx route when the
                # packages exist, else point at the documented offline recipe:
                #   export format='saved_model', then
                #   python -m tf2onnx.convert --saved-model <dir> \
                #       --output m.onnx --opset 12
                try:
                    import tf2onnx  # noqa: F401
                except ImportError as e:
                    raise NotImplementedError(
                        f"native onnx export does not cover the "
                        f"'{model.head_name}' head, and tf2onnx is absent; "
                        "use format='saved_model' + the offline tf2onnx "
                        "recipe in engine/exporter.py"
                    ) from e
                import tensorflow as tf
                from jax.experimental import jax2tf

                const_vars = jax.tree_util.tree_map(np.asarray, variables)
                tf_fn = jax2tf.convert(
                    lambda x: infer(const_vars, x), with_gradient=False
                )
                spec = tf.TensorSpec(
                    (batch, imgsz, imgsz, 3), tf.float32, name="images"
                )
                func = tf.function(tf_fn, input_signature=[spec], autograph=False)
                import tf2onnx.convert

                tf2onnx.convert.from_function(
                    func, input_signature=[spec],
                    opset=int(getattr(self.args, "opset", None) or 12),
                    output_path=str(path),
                )
                # jax2tf path traces the NHWC infer fn — the graph really
                # wants (B, H, W, 3), unlike the native NCHW emitter above
                metadata["layout"] = "NHWC, RGB, float32 in [0,1]"

        with open(out_dir / f"{name}.metadata.json", "w") as fh:
            json.dump(metadata, fh, indent=2, default=str)
        LOGGER.info(f"export {fmt} -> {path} ({time.time() - t0:.1f}s)")
        return str(path)

    def _sdk_convert(self, fmt: str, model, variables) -> str:
        """tfjs / openvino: a mechanical pass over an artifact this exporter
        already produces, gated on the vendor package (reference
        exporter.py export_tfjs / export_openvino)."""
        name = Path(str(self.args.model or f"yolov8-{model.task}")).stem
        out_dir = Path(self.args.project or ".")
        if fmt == "tfjs":
            try:
                from tensorflowjs.converters import convert_tf_saved_model
            except ImportError as e:
                raise NotImplementedError(
                    f"tensorflowjs is absent. {OFFLINE_RECIPES['tfjs']}"
                ) from e
            sm = self(model, variables, fmt="saved_model")
            out = out_dir / f"{name}_web_model"
            convert_tf_saved_model(sm, str(out))
            return str(out)
        try:
            import openvino as ov
        except ImportError as e:
            raise NotImplementedError(
                f"openvino is absent. {OFFLINE_RECIPES['openvino']}"
            ) from e
        onnx_path = self(model, variables, fmt="onnx")
        out = out_dir / f"{name}_openvino"
        out.mkdir(parents=True, exist_ok=True)
        ov.save_model(ov.convert_model(onnx_path), str(out / f"{name}.xml"))
        return str(out)


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
