"""TinyViT image encoder — the MobileSAM backbone.

Re-implements the architecture behind the reference's ``mobile_sam.pt``
variant (reference models/sam/modules/tiny_encoder.py, built by
models/sam/build.py:build_mobile_sam): conv patch embed (stride 4), an MBConv
stage, then three windowed-attention stages with conv patch merging, ending at
1/16 resolution with a 256-channel SAM neck — drop-in compatible with the
ViT-H/L/B encoders in modules.py (same (B, S/16, S/16, 256) output contract).

TPU-first deviations from the torch original, kept deliberately:
  - LayerNorm in place of BatchNorm2d in the conv stages, so the encoder's
    variables stay a pure params tree (no running batch stats to thread
    through ``Sam.encode_image``) — numerically equivalent role at SAM's
    inference-only usage.
  - window attention uses a Swin-style learned relative bias table per head,
    matching TinyViT's attention_biases semantics with static gather indices
    (XLA-friendly; no dynamic shapes).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules import MLPBlock, window_partition, window_unpartition

# tiny_vit_5m (the MobileSAM encoder): dims/depths/heads/windows per stage
TINYVIT_5M = {
    "embed_dims": (64, 128, 160, 320),
    "depths": (2, 2, 6, 2),
    "num_heads": (2, 4, 5, 10),
    "window_sizes": (7, 7, 14, 7),
}


class MBConv(nn.Module):
    """Inverted-residual conv block (TinyViT stage-0 unit)."""

    dim: int
    expand: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = int(self.dim * self.expand)
        y = nn.Conv(h, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = nn.gelu(nn.LayerNorm(name="norm1")(y))
        y = nn.Conv(h, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=h,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.gelu(nn.LayerNorm(name="norm2")(y))
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = nn.LayerNorm(name="norm3")(y)
        return nn.gelu(x + y)


class PatchMerging(nn.Module):
    """Conv downsample between stages: 1x1 -> dw3x3(s) -> 1x1
    (tiny_encoder.py PatchMerging; MobileSAM keeps stride 1 on the last
    stage so the encoder ends at 1/16)."""

    dim_out: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = nn.gelu(nn.LayerNorm(name="norm1")(y))
        y = nn.Conv(
            self.dim_out, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], feature_group_count=self.dim_out,
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="conv3")(y)
        return nn.LayerNorm(name="norm2")(y)


class WindowAttention(nn.Module):
    """MHSA inside a window with a learned relative position bias per head
    (TinyViT attention_biases / Swin rel-bias table)."""

    num_heads: int
    ws: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (nW, ws, ws, C)
        nW, H, W, C = x.shape
        hd = C // self.num_heads
        n = H * W
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x.reshape(nW, n, C))
        qkv = qkv.reshape(nW, n, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (nW, nh, n, hd)
        attn = (q * (hd ** -0.5)) @ k.transpose(0, 1, 3, 2)
        table = self.param(
            "rel_bias", nn.initializers.zeros,
            (self.num_heads, (2 * self.ws - 1) ** 2),
        )
        coords = np.stack(np.meshgrid(np.arange(H), np.arange(W), indexing="ij"))
        rel = coords.reshape(2, -1)[:, :, None] - coords.reshape(2, -1)[:, None, :]
        idx = (rel[0] + self.ws - 1) * (2 * self.ws - 1) + (rel[1] + self.ws - 1)
        attn = attn + table[:, jnp.asarray(idx)][None]  # (1, nh, n, n)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(nW, H, W, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Windowed attention + local 3x3 depthwise conv + MLP
    (tiny_encoder.py TinyViTBlock)."""

    num_heads: int
    ws: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        wins, pad_hw = window_partition(y, self.ws)
        wins = WindowAttention(self.num_heads, self.ws, dtype=self.dtype, name="attn")(wins)
        x = shortcut + window_unpartition(wins, self.ws, pad_hw, (H, W))
        x = x + nn.Conv(
            C, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=C,
            dtype=self.dtype, name="local_conv",
        )(x)
        return x + MLPBlock(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            nn.LayerNorm(name="norm2")(x)
        )


class TinyViT(nn.Module):
    """tiny_vit_5m encoder with the SAM 256-channel neck. Input
    (B, img_size, img_size, 3) in [0,1] -> (B, img_size/16, img_size/16, 256)."""

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
        # patch embed: two stride-2 convs -> 1/4 (tiny_encoder.py PatchEmbed)
        x = nn.Conv(ed[0] // 2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="patch0")(x)
        x = nn.gelu(nn.LayerNorm(name="patch_norm")(x))
        x = nn.Conv(ed[0], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="patch1")(x)
        # stage 0: MBConv stack at 1/4
        for i in range(self.depths[0]):
            x = MBConv(ed[0], dtype=self.dtype, name=f"s0_b{i}")(x)
        # stages 1-3: merge (2,2,1 strides -> 1/8, 1/16, 1/16) + attention
        strides = (2, 2, 1)
        for s in range(1, 4):
            x = PatchMerging(ed[s], stride=strides[s - 1], dtype=self.dtype,
                             name=f"merge{s}")(x)
            for i in range(self.depths[s]):
                x = TinyViTBlock(self.num_heads[s], self.window_sizes[s],
                                 dtype=self.dtype, name=f"s{s}_b{i}")(x)
        # SAM neck (same as ImageEncoderViT)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck0")(x)
        x = nn.LayerNorm(name="neck_ln0")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="neck1")(x)
        return nn.LayerNorm(name="neck_ln1")(x)
