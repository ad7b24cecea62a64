"""Deploy-time structural reparameterization — pure param-tree algebra.

Re-implements the reference's fuse surface (``BaseModel.fuse`` nn/tasks.py:120,
``fuse_conv_and_bn`` torch_utils.py:123, RepConv ``get_equivalent_kernel_bias``
conv.py:182-230) functionally: no module surgery, just a walk over the
(params, batch_stats) pytrees producing the deploy param tree for the same
GraphModel traced in deploy mode (see conv.py ``deploy_mode``):

  - Conv:     conv(no-bias) + BN        -> conv(bias)
  - Conv2:    kxk + parallel 1x1 + BN   -> kxk(bias)   (1x1 folded to center)
  - RepConv:  3x3+BN ∥ 1x1+BN ∥ id-BN   -> 3x3(bias)

Flax kernels are HWIO; BN eps matches the training modules (1e-3).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3


def _bn_terms(bn_params: Dict, bn_stats: Dict):
    t = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + BN_EPS)
    b = bn_params["bias"] - bn_stats["mean"] * t
    return t, b


def _fuse_kernel_bn(kernel, bias, bn_params, bn_stats):
    """(K, b) o BN -> (K', b'). kernel HWIO, t broadcasts over O."""
    t, shift = _bn_terms(bn_params, bn_stats)
    k = kernel * t[None, None, None, :]
    b = (bias if bias is not None else 0.0) * t + shift
    return k, b


def _pad_1x1_to_kxk(k1, k: int):
    """(1,1,I,O) -> (k,k,I,O) with the 1x1 at the center."""
    pad = (k - 1) // 2
    return jnp.pad(k1, ((pad, k - 1 - pad), (pad, k - 1 - pad), (0, 0), (0, 0)))


def _identity_kernel_like(kernel):
    """3x3 identity kernel matching (3,3,I,O) with grouping I = O/g handled by
    I==in/g: center[i % I, i] = 1 (reference RepConv id branch conv.py:204)."""
    kh, kw, ci, co = kernel.shape
    ident = np.zeros((kh, kw, ci, co), np.float32)
    for o in range(co):
        ident[kh // 2, kw // 2, o % ci, o] = 1.0
    return jnp.asarray(ident, kernel.dtype)


def _is_dict(x) -> bool:
    return isinstance(x, dict) or hasattr(x, "keys")


def fuse_tree(params: Dict, stats: Dict) -> Dict:
    """Recursively fuse a (params, batch_stats) pair into deploy params."""
    out = {}
    keys = set(params.keys())
    if {"conv1", "bn1", "conv2", "bn2"} <= keys:  # RepConv
        k3, b3 = _fuse_kernel_bn(
            params["conv1"]["kernel"], None, params["bn1"], stats["bn1"]
        )
        k1, b1 = _fuse_kernel_bn(
            params["conv2"]["kernel"], None, params["bn2"], stats["bn2"]
        )
        k = k3 + _pad_1x1_to_kxk(k1, k3.shape[0])
        b = b3 + b1
        if "bn_id" in keys:
            kid, bid = _fuse_kernel_bn(
                _identity_kernel_like(k3), None, params["bn_id"], stats["bn_id"]
            )
            k = k + kid
            b = b + bid
        rest = {
            n: fuse_tree(params[n], stats.get(n, {}))
            for n in keys - {"conv1", "bn1", "conv2", "bn2", "bn_id"}
            if _is_dict(params[n])
        }
        return {"conv": {"kernel": k, "bias": b}, **rest}
    if {"conv", "cv2", "bn"} <= keys:  # Conv2
        ksum = params["conv"]["kernel"] + _pad_1x1_to_kxk(
            params["cv2"]["kernel"], params["conv"]["kernel"].shape[0]
        )
        k, b = _fuse_kernel_bn(ksum, None, params["bn"], stats["bn"])
        rest = {
            n: fuse_tree(params[n], stats.get(n, {}))
            for n in keys - {"conv", "cv2", "bn"}
            if _is_dict(params[n])
        }
        return {"conv": {"kernel": k, "bias": b}, **rest}
    if {"conv", "bn"} <= keys and "kernel" in params["conv"]:  # Conv
        k, b = _fuse_kernel_bn(
            params["conv"]["kernel"], params["conv"].get("bias"), params["bn"], stats["bn"]
        )
        rest = {
            n: fuse_tree(params[n], stats.get(n, {}))
            for n in keys - {"conv", "bn"}
            if _is_dict(params[n])
        }
        return {"conv": {"kernel": k, "bias": b}, **rest}
    for n, v in params.items():
        out[n] = fuse_tree(v, stats.get(n, {})) if _is_dict(v) else v
    return out


def as_deploy_model(model):
    """Wrap a model so raw_forward traces in deploy mode (params must already
    be a FUSED tree — fuse_variables produces one; loading a checkpoint saved
    with deploy='fused' restores one)."""
    import copy

    deploy_model = copy.copy(model)
    deploy_model.deploy = True
    orig_raw_forward = type(model).raw_forward

    def deploy_raw_forward(self, variables, x, train: bool = False):
        from .modules.conv import deploy_mode

        assert not train, "fused models are inference-only"
        with deploy_mode(True):
            return orig_raw_forward(self, variables, x, train=False)

    deploy_model.raw_forward = deploy_raw_forward.__get__(deploy_model)
    return deploy_model


def fuse_variables(model, variables) -> Tuple[Dict, Any]:
    """(model, {params, batch_stats}) -> ({params}, deploy_model).

    The returned model is the same BaseModel subclass wired to trace in deploy
    mode; its variables have no batch_stats.

    Idempotent: a model already in deploy state (fused, or int8-quantized via
    nn/quant.py) is returned unchanged — re-fusing would treat deploy/int8
    kernels as raw train params and corrupt them (int8 codes convolved as f32
    without their dequant scales).
    """
    if getattr(model, "deploy", False):
        return variables, model
    fused_params = fuse_tree(
        dict(variables["params"]), dict(variables.get("batch_stats", {}))
    )
    return {"params": fused_params}, as_deploy_model(model)


def fold_input_scale(variables: Dict, scale: float = 1.0 / 255.0) -> Dict:
    """Fold an input-scaling preprocess into the stem conv of a FUSED tree.

    Convolution is linear in an elementwise input scale —
    ``conv(s*x, W) + b == conv(x, s*W) + b`` — so the deploy pipeline can
    skip the uint8 -> float ``x / 255`` normalize pass entirely and feed the
    raw-cast image: the bare dtype cast fuses into the conv's input read,
    while the standalone multiply costs a full extra HBM round-trip over the
    image batch (runs/bench_ablate.json "+pre": 0.61 ms at batch 128/640px).
    Integer pixel values 0..255 are exactly representable in bf16, so the
    folded path actually LOSES no input precision vs normalizing first.

    Only valid for pure-scale preprocessing (the reference pipeline's, see
    ultralytics/engine/predictor.py:129 ``im /= 255``) — a mean shift would
    need a bias term. Returns a new ``{params}`` dict; the caller's contract
    becomes "inputs are raw 0..255".
    """
    import copy

    params = copy.deepcopy(dict(variables["params"]))
    stem = params.get("layer0")
    if not (_is_dict(stem) and "conv" in stem and "kernel" in stem["conv"]):
        raise ValueError(
            "fold_input_scale needs a FUSED tree (fuse_variables) with a "
            "layer0 stem conv"
        )
    kernel = stem["conv"]["kernel"]
    if kernel.shape[2] not in (1, 3):  # grayscale or RGB image stem
        raise ValueError(
            f"layer0 conv in-channels {kernel.shape[2]} does not look like "
            "an image stem — refusing to fold"
        )
    stem["conv"]["kernel"] = (kernel.astype(jnp.float32) * scale).astype(kernel.dtype)
    out = dict(variables)
    out["params"] = params
    return out
