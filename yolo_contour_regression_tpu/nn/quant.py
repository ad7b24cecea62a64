"""Native w8a8 quantized inference — int8 convs on the MXU.

The v5e MXU runs s8 x s8 -> s32 matmuls/convs at 2x its bf16 peak (394 vs
197 TOPS), and int8 kernels halve weight HBM traffic. This module
post-training-quantizes a FUSED deploy model (nn/fuse.py) in place:

  1. **Calibrate**: run a few batches through the deploy model eagerly with
     ``quant_calibration`` capturing each deploy conv's input absmax
     (modules/conv.py deploy_conv).
  2. **Quantize**: per conv, symmetric per-out-channel weight scales
     (``w_scale = absmax(kernel, axis=(0,1,2)) / 127``) and a symmetric
     scalar input scale (``x_scale = absmax(input) / 127``); the tree's f32
     kernel is replaced by the int8 kernel and the scales join it under the
     same ``conv`` scope. Depthwise convs (kernel in-channels == 1) stay
     f32 — they never hit the MXU and contribute negligible FLOPs.
  3. **Run**: the returned model enters ``quant_mode`` so ``deploy_conv``
     takes the int8 path: quantize input -> int8 conv (int32 accum) ->
     dequantize with ``x_scale * w_scale`` -> f32 bias -> activation.
     Layer interchange stays f32/bf16, so heads/decode/NMS are untouched.

This is the reference exporter's int8 story (TensorRT / tflite-int8 PTQ,
exporter.py) rebuilt as a first-class on-device path — no vendor SDK, same
representative-data calibration idea. Accuracy is validated against the
committed floor checkpoint in tests/test_quant.py.
"""
from __future__ import annotations

from typing import Dict, Iterable, Tuple

import jax.numpy as jnp
import numpy as np


def calibrate(deploy_model, variables, calib_batches: Iterable) -> Dict[str, float]:
    """Run batches through the fused model EAGERLY, recording each deploy
    conv's input absmax keyed by module path. Returns the capture dict."""
    from .modules.conv import quant_calibration

    cal: Dict[str, float] = {}
    with quant_calibration(cal):
        for x in calib_batches:
            deploy_model.raw_forward(variables, jnp.asarray(x), train=False)
    if not cal:
        raise ValueError(
            "calibration saw no deploy convs — pass a FUSED model "
            "(nn.fuse.fuse_variables) and at least one batch"
        )
    return cal


def int8_wins(info: Dict) -> bool:
    """Selective-quantization predicate from the on-chip micro-bench
    (runs/bench_int8_micro.json): the int8 deploy composition (quantize ->
    s8 conv -> dequantize) only beats bf16 on deep/narrow layers — 1.3-1.6x
    at 40x40x128 / 20x20x256 — and LOSES on wide spatial layers whose
    bandwidth-bound convs can't amortize the VPU epilogue. Channel depth is
    the discriminating feature on the measured ladder."""
    return info.get("cin", 0) >= 128


def quantize_tree(params: Dict, cal: Dict, selective: bool = False) -> Tuple[Dict, int, int]:
    """Return a copy of the fused param tree with int8 kernels + scales for
    every calibrated conv; (tree, n_quantized, n_skipped). With
    ``selective=True`` only layers where ``int8_wins`` says the int8
    composition is faster than bf16 are converted."""
    import copy

    out = copy.deepcopy(params)
    n_q = n_skip = 0
    for key, info in cal.items():
        if not isinstance(info, dict):  # legacy float absmax
            info = {"absmax": float(info)}
        absmax = info["absmax"]
        node = out
        for part in (p for p in key.split("/") if p):  # "" = top-level module
            node = node[part]
        conv = node["conv"]
        kernel = np.asarray(conv["kernel"], np.float32)
        if kernel.shape[2] == 1 and kernel.shape[3] > 1:
            # depthwise (in-channels-per-group == 1): VPU work, skip
            n_skip += 1
            continue
        if selective and not int8_wins(info):
            n_skip += 1
            continue
        w_scale = np.maximum(
            np.abs(kernel).max(axis=(0, 1, 2)) / 127.0, 1e-8
        ).astype(np.float32)
        k_q = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
        conv["kernel"] = jnp.asarray(k_q)
        conv["w_scale"] = jnp.asarray(w_scale)
        conv["x_scale"] = jnp.asarray(np.float32(max(absmax / 127.0, 1e-8)))
        n_q += 1
    return out, n_q, n_skip


def as_quantized_model(model):
    """Wrap a model so raw_forward traces in deploy+quant mode (params must
    carry int8 kernels + scales — quantize_variables produces them; loading a
    checkpoint saved with deploy='int8' restores them)."""
    import copy

    q_model = copy.copy(model)
    q_model.deploy = True
    q_model.quantized = True
    base_raw_forward = type(model).raw_forward

    def quant_raw_forward(self, variables, x, train: bool = False):
        from .modules.conv import deploy_mode, quant_mode

        assert not train, "quantized models are inference-only"
        with deploy_mode(True), quant_mode(True):
            return base_raw_forward(self, variables, x, train=False)

    q_model.raw_forward = quant_raw_forward.__get__(q_model)
    return q_model


def quantize_variables(deploy_model, variables, calib_batches: Iterable,
                       selective: bool = False):
    """(fused model, {params}, batches) -> ({params}, quantized model).

    The returned model's raw_forward runs inside ``quant_mode`` (on top of
    deploy mode), so every conv whose scope carries an int8 kernel takes the
    MXU int8 path. Unquantized scopes (depthwise, heads, and — with
    ``selective=True`` — wide spatial layers where the measured int8
    composition loses to bf16) run unchanged."""
    from ..utils import LOGGER

    cal = calibrate(deploy_model, variables, calib_batches)
    qparams, n_q, n_skip = quantize_tree(variables["params"], cal,
                                         selective=selective)
    LOGGER.info(f"quantized {n_q} convs to int8 ({n_skip} kept f32"
                f"{' — selective mode' if selective else ', depthwise'})")
    return {"params": qparams}, as_quantized_model(deploy_model)
