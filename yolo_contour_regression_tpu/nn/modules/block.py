"""Composite blocks — flax.linen, NHWC.

TPU-native re-implementation of ``ultralytics/nn/modules/block.py``: DFL
(block.py:17), Proto (block.py:38), SPP/SPPF, C1/C2/C2f/C3/C3x/RepC3,
RepBlock (the fork's addition, block.py:249-262 — a single RepConv), HGStem/
HGBlock, Ghost bottlenecks, Bottleneck/BottleneckCSP.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv, DWConv, GhostConv, LightConv, RepConv


def _maxpool_same(x, k: int, s: int = 1):
    p = k // 2
    return nn.max_pool(
        x, (k, k), strides=(s, s), padding=[(p, p), (p, p)]
    )


class DFL(nn.Module):
    """Distribution Focal Loss integral head (block.py:17).

    Softmax over reg_max bins then expectation — expressed directly instead of
    the reference's frozen-conv trick (same math, XLA fuses it anyway).
    x: (B, 4*reg_max, A) -> (B, 4, A).
    """

    reg_max: int = 16

    def __call__(self, x):
        b, c, a = x.shape
        x = x.reshape(b, 4, self.reg_max, a)
        probs = nn.softmax(x, axis=2)
        proj = jnp.arange(self.reg_max, dtype=probs.dtype)
        return jnp.einsum("bkra,r->bka", probs, proj)


class Proto(nn.Module):
    """Mask prototypes for the stock (non-polar) seg head (block.py:38)."""

    c_: int = 256
    c2: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c_, 3, dtype=self.dtype, name="cv1")(x, train)
        x = _resize2x(x)
        x = Conv(self.c_, 3, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(x, train)


def _resize2x(x):
    """Nearest-neighbor 2x upsample, NHWC."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Bottleneck(nn.Module):
    """Standard bottleneck (block.py:300)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C2f(nn.Module):
    """Fast CSP bottleneck with 2 convs (block.py:183)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(
                Bottleneck(
                    c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m{i}"
                )(ys[-1], train)
            )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), train
        )


class C3(nn.Module):
    """CSP bottleneck with 3 convs (block.py:202)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: Tuple[int, int] = (1, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(
                c_, self.shortcut, self.g, k=self.k, e=1.0, dtype=self.dtype, name=f"m{i}"
            )(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class C3x(C3):
    """C3 with (1,3)->(3,3)... cross-convs variant (block.py:221): k=((1,3),(3,1))
    approximated with 3x3 per reference behavior at equal channel counts."""

    k: Tuple[int, int] = (3, 3)


class RepC3(nn.Module):
    """C3 with RepConv bottlenecks (block.py:228, used by RT-DETR neck)."""

    c2: int
    n: int = 3
    e: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = RepConv(c_, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = y1 + y2
        if c_ != self.c2:
            y = Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="cv3")(y, train)
        return y


class RepBlock(nn.Module):
    """The fork's RepBlock (block.py:249-262): despite taking an `n` repeats
    arg from the yaml, the checked-in forward is a SINGLE RepConv(c1, c2, 3, 1)
    — we reproduce that exactly so parameter counts and graphs match."""

    c2: int
    n: int = 1  # accepted for yaml parity; intentionally unused (see docstring)
    shortcut: bool = True  # accepted for yaml parity; unused by the reference too
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return RepConv(self.c2, dtype=self.dtype, name="cv1")(x, train)


class C1(nn.Module):
    """CSP bottleneck with 1 conv (block.py:145)."""

    c2: int
    n: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        z = y
        for i in range(self.n):
            z = Conv(self.c2, 3, dtype=self.dtype, name=f"m{i}")(z, train)
        return z + y


class C2(nn.Module):
    """CSP bottleneck with 2 convs (block.py:160)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            a = Bottleneck(
                c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m{i}"
            )(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


class SPP(nn.Module):
    """Spatial pyramid pooling (block.py:111)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        pooled = [x] + [_maxpool_same(x, k) for k in self.k]
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pooled, axis=-1), train
        )


class SPPF(nn.Module):
    """Fast SPP: 3 chained 5x5 maxpools (block.py:127)."""

    c2: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = _maxpool_same(x, self.k)
        y2 = _maxpool_same(y1, self.k)
        y3 = _maxpool_same(y2, self.k)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (block.py:278)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        if self.s == 2:
            y = Conv(c_, self.k, self.s, g=c_, act=False, dtype=self.dtype, name="dw")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="cv2")(y, train)
        if self.s == 2:
            sc = Conv(x.shape[-1], self.k, self.s, g=x.shape[-1], act=False, dtype=self.dtype, name="sc_dw")(x, train)
            sc = Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x if x.shape[-1] == self.c2 else Conv(self.c2, 1, act=False, dtype=self.dtype, name="sc_pw")(x, train)
        return y + sc


class C3Ghost(C3):
    """C3 with GhostBottlenecks (block.py:272) — structural variant."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = GhostBottleneck(c_, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class HGStem(nn.Module):
    """PPHGNetV2 stem (block.py:54)."""

    cm: int
    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.cm, 3, 2, act="relu", dtype=self.dtype, name="stem1")(x, train)
        x2 = Conv(self.cm // 2, 2, 1, p=0, act="relu", dtype=self.dtype, name="stem2a")(
            jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0))), train
        )
        x2 = Conv(self.cm, 2, 1, p=0, act="relu", dtype=self.dtype, name="stem2b")(
            jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0))), train
        )
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1), padding=[(0, 1), (0, 1)])
        x = jnp.concatenate([x1, x2], axis=-1)
        x = Conv(self.c2, 3, 2, act="relu", dtype=self.dtype, name="stem3")(x, train)
        return Conv(self.c2, 1, 1, act="relu", dtype=self.dtype, name="stem4")(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 HG block (block.py:77)."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ys = [x]
        block = LightConv if self.lightconv else Conv
        for i in range(self.n):
            kw = dict(act=self.act, dtype=self.dtype, name=f"m{i}")
            ys.append(block(self.cm, self.k, **kw)(ys[-1], train))
        y = jnp.concatenate(ys, axis=-1)
        y = Conv(self.c2 // 2, 1, 1, act=self.act, dtype=self.dtype, name="sc")(y, train)
        y = Conv(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="ec")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            y = y + x
        return y


class NASBottleneck(nn.Module):
    """QARepVGG-style residual bottleneck: two RepConv 3x3 with identity add.

    The YOLO-NAS building block (the reference wraps super-gradients'
    YoloNASBottleneck — no architecture code in-repo, see reference
    models/nas/model.py:34: the graph lives in the external package). Deploy
    mode reparameterizes each RepConv into one 3x3 (nn/fuse.py), so the
    fused block is two convs + add — MXU-friendly and quantization-clean.
    """

    c2: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = RepConv(self.c2, dtype=self.dtype, name="cv1")(x, train)
        y = RepConv(self.c2, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            y = y + x
        return y


class NASCSP(nn.Module):
    """YOLO-NAS CSP stage (super-gradients YoloNASCSPLayer semantics): 1x1
    split into a NASBottleneck chain and a bypass, concat, 1x1 out."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = NASBottleneck(c_, self.shortcut, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )
