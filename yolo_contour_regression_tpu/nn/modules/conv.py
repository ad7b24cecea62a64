"""Convolution primitives — flax.linen, NHWC, bf16-friendly.

TPU-native re-implementation of the reference conv zoo
(``ultralytics/nn/modules/conv.py``): Conv (conv+BN+act, default act **ReLU**
per the fork's change at conv.py:28), Conv2 (parallel 1x1 branch, conv.py:47),
DWConv, ConvTranspose, Focus, GhostConv, RepConv (RepVGG-style 3x3+1x1+id,
conv.py:153-230), channel/spatial attention, Concat.

Design notes (not a port):
  - NHWC layout end-to-end — XLA's TPU conv emitter wants feature-minor.
  - BatchNorm is folded at inference via `fuse` param trees (see
    ``fuse.py``) instead of module surgery.
  - "autopad" semantics (same-shape for odd kernels, stride divides) are
    reproduced with explicit symmetric padding so shapes match the reference
    graph exactly at every level.
"""
from __future__ import annotations

import contextlib
from contextvars import ContextVar
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Deploy (fused) mode: when set, Conv/Conv2/RepConv build as a single
# conv-with-bias (BN and parallel branches structurally removed). Set by
# GraphModel during tracing; param trees are produced by nn/fuse.py.
_DEPLOY: ContextVar = ContextVar("ycr_deploy_mode", default=False)


@contextlib.contextmanager
def deploy_mode(on: bool = True):
    tok = _DEPLOY.set(on)
    try:
        yield
    finally:
        _DEPLOY.reset(tok)


def in_deploy_mode() -> bool:
    return _DEPLOY.get()


# w8a8 quantized deploy mode (nn/quant.py): deploy convs whose param scope
# carries int8 kernels + scales run on the int8 MXU path. Orthogonal to
# _DEPLOY (quant implies deploy).
_QUANT: ContextVar = ContextVar("ycr_quant_mode", default=False)
# calibration capture: a dict {module-path: input absmax} filled during an
# eager calibration pass (nn/quant.py quantize_variables)
_QCAL: ContextVar = ContextVar("ycr_quant_calib", default=None)


@contextlib.contextmanager
def quant_mode(on: bool = True):
    tok = _QUANT.set(on)
    try:
        yield
    finally:
        _QUANT.reset(tok)


def in_quant_mode() -> bool:
    return _QUANT.get()


@contextlib.contextmanager
def quant_calibration(store: dict):
    tok = _QCAL.set(store)
    try:
        yield
    finally:
        _QCAL.reset(tok)


class _DeployConvParams(nn.Module):
    """Owns the deploy conv's parameters under the same ``conv/{kernel,bias}``
    paths nn.Conv used, plus the optional quantization extras
    (``w_scale`` per-out-channel, ``x_scale`` scalar) that nn/quant.py adds."""

    c2: int
    kshape: Sequence[int]

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), tuple(self.kshape), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.c2,), jnp.float32)
        if self.has_variable("params", "w_scale"):
            w_scale = self.param("w_scale", nn.initializers.ones_init(), (self.c2,), jnp.float32)
            x_scale = self.param("x_scale", nn.initializers.ones_init(), (), jnp.float32)
            return kernel, bias, w_scale, x_scale
        return kernel, bias, None, None


def deploy_conv(mod: nn.Module, x, c2: int, k: int, s: int, p: int, g: int = 1,
                d: int = 1, dtype=jnp.float32):
    """The fused conv+bias every deploy branch (Conv/Conv2/RepConv) runs.

    Three modes on one param layout:
      - plain deploy: f32/bf16 ``lax.conv`` (same math nn.Conv did)
      - calibration (``quant_calibration``): record the input absmax per
        module path for nn/quant.py, then run the plain conv (eager only)
      - quant (``quant_mode`` + int8 kernel in the tree): quantize the input
        with the calibrated ``x_scale``, run the conv as s8 x s8 -> s32 on
        the MXU (2x the bf16 peak on v5e), dequantize with
        ``x_scale * w_scale`` per channel and add the f32 bias.
    """
    c1 = x.shape[-1]
    kernel, bias, w_scale, x_scale = _DeployConvParams(
        c2, (k, k, c1 // g, c2), name="conv"
    )()
    cal = _QCAL.get()
    if cal is not None:
        key = "/".join(mod.path)
        prev = cal.get(key, {}).get("absmax", 0.0) if isinstance(cal.get(key), dict) else 0.0
        cal[key] = {
            "absmax": max(prev, float(jnp.max(jnp.abs(x)))),
            # layer-shape features for the selective int8 predicate
            # (nn/quant.py: the micro-bench says the quant epilogue only
            # pays for itself on deep/narrow layers)
            "h": int(x.shape[1]), "w": int(x.shape[2]),
            "cin": int(c1), "cout": int(c2), "groups": int(g),
        }
    dn = ("NHWC", "HWIO", "NHWC")
    pad = [(p, p), (p, p)]
    if in_quant_mode() and w_scale is not None and kernel.dtype == jnp.int8:
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x_q, kernel, (s, s), pad, rhs_dilation=(d, d),
            feature_group_count=g, dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * (x_scale * w_scale) + bias).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (s, s), pad, rhs_dilation=(d, d),
        feature_group_count=g, dimension_numbers=dn,
    )
    return y + bias.astype(dtype)

# The fork switched the default activation from SiLU to ReLU (conv.py:28,158).
DEFAULT_ACT = "relu"

ACTS: dict = {
    "relu": nn.relu,
    "silu": nn.silu,
    "swish": nn.silu,
    "gelu": nn.gelu,
    "identity": lambda x: x,
    "sigmoid": nn.sigmoid,
    "leaky_relu": lambda x: nn.leaky_relu(x, 0.01),
}


def get_act(act) -> Callable:
    if callable(act):
        return act
    if act is True or act is None:
        return ACTS[DEFAULT_ACT]
    if act is False:
        return ACTS["identity"]
    return ACTS[act]


def autopad(k: int, p=None, d: int = 1):
    """Same-shape padding for odd kernels (reference conv.py:14 autopad)."""
    k = d * (k - 1) + 1 if d > 1 else k
    return (k - 1) // 2 if p is None else p


class Conv(nn.Module):
    """conv2d + BN + act."""

    c2: int
    k: int = 1
    s: int = 1
    p: Any = None
    g: int = 1
    d: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.k, self.p, self.d)
        if in_deploy_mode():
            x = deploy_conv(self, x, self.c2, self.k, self.s, p, self.g,
                            self.d, dtype=self.dtype)
            return get_act(self.act)(x)
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(p, p), (p, p)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return get_act(self.act)(x)


class Conv2(nn.Module):
    """Conv with a parallel 1x1 branch added pre-activation (conv.py:47-72).

    At deploy the 1x1 kernel folds into the center of the kxk kernel
    (`fuse.py:fuse_conv2`)."""

    c2: int
    k: int = 3
    s: int = 1
    p: Any = None
    g: int = 1
    d: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.k, self.p, self.d)
        if in_deploy_mode():
            y = deploy_conv(self, x, self.c2, self.k, self.s, p, self.g,
                            dtype=self.dtype)
            return get_act(self.act)(y)
        y = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(p, p), (p, p)],
            feature_group_count=self.g,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        y = y + nn.Conv(
            self.c2,
            (1, 1),
            strides=(self.s, self.s),
            padding="VALID",
            feature_group_count=self.g,
            use_bias=False,
            dtype=self.dtype,
            name="cv2",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(y)
        return get_act(self.act)(y)


class DWConv(nn.Module):
    """Depthwise conv: groups = gcd(c1, c2) (reference conv.py:106 — note its
    positional signature is (c2, k, s, d, act), no p/g)."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math as _math

        g = _math.gcd(x.shape[-1], self.c2)
        return Conv(
            self.c2, self.k, self.s, None, g, self.d, self.act, dtype=self.dtype,
            name="dw",
        )(x, train)


class LightConv(nn.Module):
    """1x1 Conv + depthwise Conv (reference conv.py:75)."""

    c2: int
    k: int = 3
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        return Conv(
            self.c2, self.k, g=self.c2, act=self.act, dtype=self.dtype, name="conv2"
        )(x, train)


class ConvTranspose(nn.Module):
    """Transposed conv + optional BN + act (reference conv.py:116)."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d(k, s, p): out = (in-1)*s - 2p + k; flax's
        # explicit padding counts differently, but "VALID" reproduces the
        # p=0 torch case (out = in*s + max(k-s, 0)) used by the v6 neck
        pad = "VALID" if self.p == 0 else [(self.p, self.p), (self.p, self.p)]
        x = nn.ConvTranspose(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=pad,
            use_bias=not self.bn,
            dtype=self.dtype,
            name="conv_transpose",
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                dtype=self.dtype,
                name="bn",
            )(x)
        return get_act(self.act)(x)


class Focus(nn.Module):
    """Space-to-depth 2x then Conv (reference conv.py:199 Focus)."""

    c2: int
    k: int = 1
    s: int = 1
    p: Any = None
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        return Conv(self.c2, self.k, self.s, self.p, act=self.act, dtype=self.dtype, name="conv")(
            x, train
        )


class GhostConv(nn.Module):
    """Primary conv + cheap depthwise expansion (reference conv.py:218)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, act=self.act, dtype=self.dtype, name="cv1")(
            x, train
        )
        y2 = Conv(c_, 5, 1, None, c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class RepConv(nn.Module):
    """RepVGG-style training block: 3x3 + 1x1 (+ identity BN when c1==c2, s=1).

    Reference conv.py:153-230; default act ReLU (conv.py:158). Deploy-time
    structural reparameterization into a single 3x3 is weight algebra on the
    param tree (`fuse.py:fuse_repconv`), keeping this module purely functional.
    """

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    d: int = 1
    act: Any = True
    use_id_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.k == 3
        if in_deploy_mode():
            y = deploy_conv(self, x, self.c2, 3, self.s, 1, self.g,
                            dtype=self.dtype)
            return get_act(self.act)(y)
        c1 = x.shape[-1]
        bn_kw = dict(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype
        )
        y1 = nn.Conv(
            self.c2, (3, 3), strides=(self.s, self.s), padding=[(1, 1), (1, 1)],
            feature_group_count=self.g, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y1 = nn.BatchNorm(name="bn1", **bn_kw)(y1)
        y2 = nn.Conv(
            self.c2, (1, 1), strides=(self.s, self.s), padding="VALID",
            feature_group_count=self.g, use_bias=False, dtype=self.dtype, name="conv2",
        )(x)
        y2 = nn.BatchNorm(name="bn2", **bn_kw)(y2)
        y = y1 + y2
        if self.use_id_bn and c1 == self.c2 and self.s == 1:
            y = y + nn.BatchNorm(name="bn_id", **bn_kw)(x)
        return get_act(self.act)(y)


class ChannelAttention(nn.Module):
    """Squeeze-excite style channel attention (reference conv.py:233)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        pooled = x.mean(axis=(1, 2), keepdims=True)
        w = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="fc")(pooled)
        return x * nn.sigmoid(w)


class SpatialAttention(nn.Module):
    """Spatial attention over channel mean/max maps (reference conv.py:248)."""

    k: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.concatenate(
            [x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1
        )
        p = self.k // 2
        w = nn.Conv(
            1, (self.k, self.k), padding=[(p, p), (p, p)], use_bias=False,
            dtype=self.dtype, name="cv1",
        )(pooled)
        return x * nn.sigmoid(w)


class CBAM(nn.Module):
    """Channel + spatial attention (reference conv.py:261)."""

    k: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(dtype=self.dtype, name="channel_attention")(x, train)
        return SpatialAttention(self.k, dtype=self.dtype, name="spatial_attention")(x, train)


class Concat(nn.Module):
    """Concatenate a list of tensors along channels (reference conv.py:273)."""

    axis: int = -1

    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        return jnp.concatenate(list(xs), axis=self.axis)
