"""TinyViT image encoder — the MobileSAM backbone, checkpoint-faithful.

Re-implements the reference ``models/sam/modules/tiny_encoder.py`` (built by
build.py:build_mobile_sam) so official ``mobile_sam.pt`` weights convert
tensor-for-tensor (utils/torch_convert.py:convert_sam_state_dict): conv
patch embed (two stride-2 Conv+BN), an MBConv stage, three windowed-attention
stages with Conv+BN patch merging (the last merge is stride 1, so the encoder
ends at 1/16), TinyViT attention with a learned per-head bias over unique
absolute offsets, depthwise local convs, and the SAM 256-channel neck —
drop-in compatible with the ViT-H/L/B encoders in modules.py (same
(B, S/16, S/16, 256) output contract). NHWC layout, static shapes; window
padding uses the same pad-bottom/right-then-crop scheme as the original.

tiny_vit_5m config (MobileSAM): dims (64,128,160,320), depths (2,2,6,2),
heads (2,4,5,10), windows (7,7,14,7).
"""
from __future__ import annotations

import itertools
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules import _gelu, window_partition, window_unpartition

# tiny_vit_5m (the MobileSAM encoder): dims/depths/heads/windows per stage
TINYVIT_5M = {
    "embed_dims": (64, 128, 160, 320),
    "depths": (2, 2, 6, 2),
    "num_heads": (2, 4, 5, 10),
    "window_sizes": (7, 7, 14, 7),
}


class Conv2dBN(nn.Module):
    """Bias-free conv + BatchNorm (tiny_encoder.py Conv2d_BN). Inference
    uses running stats; the submodules are named ``c``/``bn`` to mirror the
    checkpoint keys."""

    out: int
    ks: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out, (self.ks, self.ks), strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2, feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, name="c",
        )(x)
        return nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn"
        )(x)


class PatchEmbed(nn.Module):
    """Two stride-2 Conv+BN with a GELU between -> 1/4 resolution
    (tiny_encoder.py PatchEmbed; submodules seq.0 / seq.2)."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2dBN(self.embed_dim // 2, 3, 2, 1, dtype=self.dtype, name="seq0")(x)
        return Conv2dBN(self.embed_dim, 3, 2, 1, dtype=self.dtype, name="seq2")(_gelu(x))


class MBConv(nn.Module):
    """Inverted-residual conv block (tiny_encoder.py MBConv): 1x1 expand,
    3x3 depthwise, 1x1 project, GELUs, residual, GELU after the add."""

    out: int
    expand: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = int(x.shape[-1] * self.expand)
        y = _gelu(Conv2dBN(h, 1, dtype=self.dtype, name="conv1")(x))
        y = _gelu(Conv2dBN(h, 3, 1, 1, groups=h, dtype=self.dtype, name="conv2")(y))
        y = Conv2dBN(self.out, 1, dtype=self.dtype, name="conv3")(y)
        return _gelu(x + y)


class PatchMerging(nn.Module):
    """Conv downsample between stages: 1x1 -> act -> dw3x3(stride) -> act ->
    1x1 (tiny_encoder.py PatchMerging). The original keeps stride 1 when the
    output dim is 320/448/576 so MobileSAM ends at 1/16 — expressed here as
    an explicit ``stride``."""

    out: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _gelu(Conv2dBN(self.out, 1, dtype=self.dtype, name="conv1")(x))
        x = _gelu(Conv2dBN(self.out, 3, self.stride, 1, groups=self.out,
                           dtype=self.dtype, name="conv2")(x))
        return Conv2dBN(self.out, 1, dtype=self.dtype, name="conv3")(x)


def _bias_idxs(h: int, w: int) -> np.ndarray:
    """(N, N) index map into the unique-|offset| bias table, in the
    original's first-encounter order (tiny_encoder.py Attention.__init__)."""
    points = list(itertools.product(range(h), range(w)))
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return np.asarray(idxs, np.int32).reshape(len(points), len(points))


def num_bias_offsets(h: int, w: int) -> int:
    return int(_bias_idxs(h, w).max()) + 1


class TinyAttention(nn.Module):
    """TinyViT attention (tiny_encoder.py Attention): pre-LayerNorm, fused
    qkv with split dims (key_dim q/k, attn_ratio*key_dim v), and a learned
    per-head additive bias over unique absolute offsets."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float = 1.0
    resolution: Tuple[int, int] = (7, 7)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, C), N == resolution[0] * resolution[1]
        B, N, _ = x.shape
        kd = self.key_dim
        d = int(self.attn_ratio * kd)
        nh = self.num_heads
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(nh * (2 * kd + d), dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, nh, 2 * kd + d)
        q, k, v = qkv[..., :kd], qkv[..., kd : 2 * kd], qkv[..., 2 * kd :]
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))  # (B, nh, N, .)
        biases = self.param(
            "attention_biases", nn.initializers.zeros,
            (nh, num_bias_offsets(*self.resolution)),
        )
        idx = jnp.asarray(_bias_idxs(*self.resolution))
        attn = (q * (kd ** -0.5)) @ k.transpose(0, 1, 3, 2) + biases[:, idx][None]
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, nh * d)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Windowed attention + depthwise local conv + MLP
    (tiny_encoder.py TinyViTBlock). Input (B, H, W, C)."""

    num_heads: int
    ws: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        kd = C // self.num_heads
        shortcut = x
        if H == self.ws and W == self.ws:
            y = TinyAttention(C, kd, self.num_heads, resolution=(H, W),
                              dtype=self.dtype, name="attn")(x.reshape(B, H * W, C))
            y = y.reshape(B, H, W, C)
        else:
            wins, pad_hw = window_partition(x, self.ws)
            nW = wins.shape[0]
            y = TinyAttention(C, kd, self.num_heads, resolution=(self.ws, self.ws),
                              dtype=self.dtype, name="attn")(
                wins.reshape(nW, self.ws * self.ws, C))
            y = window_unpartition(y.reshape(nW, self.ws, self.ws, C),
                                   self.ws, pad_hw, (H, W))
        x = shortcut + y
        x = Conv2dBN(C, 3, 1, 1, groups=C, dtype=self.dtype, name="local_conv")(x)
        # MLP with its own pre-norm (tiny_encoder.py Mlp)
        m = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(x)
        m = _gelu(nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(m))
        return x + nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(m)


class ConvStage(nn.Module):
    """Stage 0: MBConv stack + merge (tiny_encoder.py ConvLayer)."""

    depth: int
    out_dim: int
    merge_stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = MBConv(x.shape[-1], dtype=self.dtype, name=f"block{i}")(x)
        return PatchMerging(self.out_dim, self.merge_stride,
                            dtype=self.dtype, name="downsample")(x)


class AttnStage(nn.Module):
    """Stages 1..3: TinyViT blocks + optional merge (tiny_encoder.py
    BasicLayer)."""

    depth: int
    num_heads: int
    ws: int
    out_dim: int = 0  # 0 = no downsample (final stage)
    merge_stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = TinyViTBlock(self.num_heads, self.ws, dtype=self.dtype,
                             name=f"block{i}")(x)
        if self.out_dim:
            x = PatchMerging(self.out_dim, self.merge_stride,
                             dtype=self.dtype, name="downsample")(x)
        return x


class TinyViT(nn.Module):
    """tiny_vit_5m encoder with the SAM 256-channel neck. Input
    (B, img_size, img_size, 3) normalized -> (B, img_size/16, img_size/16,
    256)."""

    img_size: int = 1024
    embed_dims: Tuple[int, ...] = TINYVIT_5M["embed_dims"]
    depths: Tuple[int, ...] = TINYVIT_5M["depths"]
    num_heads: Tuple[int, ...] = TINYVIT_5M["num_heads"]
    window_sizes: Tuple[int, ...] = TINYVIT_5M["window_sizes"]
    out_chans: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ed = self.embed_dims
        x = PatchEmbed(ed[0], dtype=self.dtype, name="patch_embed")(x)  # 1/4
        # layer0 merges to ed[1] at 1/8; layer1 to ed[2] at 1/16; layer2 to
        # ed[3] with STRIDE 1 (tiny_encoder.py PatchMerging stride_c rule for
        # out_dim 320/448/576) so layer3 and the neck stay at 1/16
        x = ConvStage(self.depths[0], ed[1], dtype=self.dtype, name="layer0")(x)
        x = AttnStage(self.depths[1], self.num_heads[1], self.window_sizes[1],
                      out_dim=ed[2], dtype=self.dtype, name="layer1")(x)
        x = AttnStage(self.depths[2], self.num_heads[2], self.window_sizes[2],
                      out_dim=ed[3], merge_stride=1, dtype=self.dtype,
                      name="layer2")(x)
        x = AttnStage(self.depths[3], self.num_heads[3], self.window_sizes[3],
                      dtype=self.dtype, name="layer3")(x)
        # SAM neck (same structure + names as ImageEncoderViT)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck0")(x)
        x = nn.LayerNorm(name="neck_ln0")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="neck1")(x)
        return nn.LayerNorm(name="neck_ln1")(x)
