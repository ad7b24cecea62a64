"""Transformer modules — flax.linen, for RT-DETR and ViT-style blocks.

Re-implementation of ``ultralytics/nn/modules/transformer.py`` (378 LoC):
TransformerEncoderLayer (:20), AIFI with 2D sin-cos positions (:70),
TransformerLayer/Block (:100/:120), MLPBlock/MLP (:142/:154), LayerNorm2d
(:171), MSDeformAttn (:187), DeformableTransformerDecoder(Layer) (:273/:330).

The deformable attention's bilinear sampling (torch F.grid_sample in the
reference, nn/modules/utils.py:41) is expressed as a vectorized gather+lerp —
XLA lowers it to efficient dynamic-slices; no custom kernel needed at RT-DETR
query counts (300 x 4 points x 3 levels).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


class MLP(nn.Module):
    """num_layers-deep ReLU MLP (reference transformer.py:154).

    ``zero_last`` zero-inits the final layer (weight AND bias) — the
    reference's RTDETRDecoder._reset_parameters (head.py:1002-1008) does this
    for every bbox head so boxes start exactly at their anchors / previous
    layer's refinement; random deltas there measurably slow DETR convergence.
    """

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    zero_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layers{i}")(x))
        kw = {"kernel_init": nn.initializers.zeros} if self.zero_last else {}
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name=f"layers{self.num_layers - 1}", **kw)(x)


class MLPBlock(nn.Module):
    """(reference transformer.py:142)."""

    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.gelu(nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x))
        return nn.Dense(d, dtype=self.dtype, name="lin2")(h)


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC maps (reference transformer.py:171)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps)(x)


class TransformerEncoderLayer(nn.Module):
    """Post-norm MHSA + FFN (reference transformer.py:20)."""

    cm: int = 2048
    num_heads: int = 8
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos=None, train: bool = False):
        c = src.shape[-1]
        q = k = src if pos is None else src + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="ma",
            dropout_rate=self.dropout, deterministic=not train,
        )(q, k, src)
        src = nn.LayerNorm(name="norm1")(src + attn)
        h = nn.Dense(self.cm, dtype=self.dtype, name="fc1")(src)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(nn.gelu(h))
        return nn.LayerNorm(name="norm2")(src + h)


def sincos_2d_position(w: int, h: int, dim: int, temperature: float = 10000.0):
    """2D sin-cos position embedding (reference AIFI transformer.py:83).
    Returns (1, h*w, dim), w-major flatten to match grid_w/grid_h meshgrid."""
    assert dim % 4 == 0
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    gw, gh = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), indexing="ij"
    )
    out_w = gw.reshape(-1)[:, None] * omega[None]
    out_h = gh.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1
    )[None]


class AIFI(TransformerEncoderLayer):
    """Intra-scale feature interaction on the last FPN level (reference
    transformer.py:70): NHWC map -> tokens -> encoder layer -> map."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # NOTE the reference flattens NCHW row-major over (h, w) but builds the
        # pos table w-major; tokens here are (h*w) row-major so transpose the
        # table's grid to match
        pos = sincos_2d_position(w, h, c)  # (1, w*h, c), w-major
        pos = pos.reshape(1, w, h, c).transpose(0, 2, 1, 3).reshape(1, h * w, c)
        tokens = x.reshape(b, h * w, c)
        out = super().__call__(tokens, pos=pos.astype(x.dtype), train=train)
        return out.reshape(b, h, w, c)


class TransformerLayer(nn.Module):
    """Norm-free self-attention block (reference transformer.py:100)."""

    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="v")(x)
        x = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="ma"
        )(q, k, v) + x
        h = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        return nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(h) + x


class TransformerBlock(nn.Module):
    """Conv (if channel change) + learned pos + n TransformerLayers
    (reference transformer.py:120)."""

    c2: int
    num_heads: int = 8
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .conv import Conv

        if x.shape[-1] != self.c2:
            x = Conv(self.c2, dtype=self.dtype, name="conv")(x, train)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        # learned position embedding: p + linear(p) (reference transformer.py:133)
        tokens = tokens + nn.Dense(c, dtype=self.dtype, name="linear")(tokens)
        for i in range(self.num_layers):
            tokens = TransformerLayer(self.num_heads, dtype=self.dtype, name=f"tr{i}")(
                tokens, train
            )
        return tokens.reshape(b, h, w, self.c2)


def bilinear_grid_sample(value: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch.F.grid_sample(mode=bilinear, padding=zeros, align_corners=False).

    value (B, H, W, C); grid (B, Q, P, 2) in [-1, 1] xy. -> (B, Q, P, C).
    """
    B, H, W, C = value.shape
    x = (grid[..., 0] + 1) * W / 2 - 0.5
    y = (grid[..., 1] + 1) * H / 2 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = value.reshape(B, H * W, C)
        idx = yi_c * W + xi_c  # (B, Q, P)
        v = jnp.take_along_axis(flat, idx.reshape(B, -1, 1), axis=1).reshape(
            *idx.shape, C
        )
        return v * inb[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    return (
        v00 * ((1 - wx) * (1 - wy))[..., None]
        + v01 * (wx * (1 - wy))[..., None]
        + v10 * ((1 - wx) * wy)[..., None]
        + v11 * (wx * wy)[..., None]
    )


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (reference transformer.py:187)."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32

    def _offset_bias_init(self, key, shape, dtype=jnp.float32):
        """Reference's directional init (transformer.py:215): per-head unit
        directions scaled by point index."""
        thetas = jnp.arange(self.n_heads, dtype=jnp.float32) * (2 * math.pi / self.n_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
        grid = grid / jnp.abs(grid).max(-1, keepdims=True)
        grid = jnp.tile(grid[:, None, None, :], (1, self.n_levels, self.n_points, 1))
        scale = jnp.arange(1, self.n_points + 1, dtype=jnp.float32)[None, None, :, None]
        return (grid * scale).reshape(-1)

    @nn.compact
    def __call__(self, query, refer_bbox, value, value_shapes: Sequence[Tuple[int, int]]):
        """query (B, Q, C); refer_bbox (B, Q, L, 2 or 4) normalized;
        value (B, V, C) concat over levels; value_shapes static [(h, w), ...]."""
        B, Q = query.shape[:2]
        hd = self.d_model // self.n_heads
        v = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, -1, self.n_heads, hd)

        off = nn.Dense(
            self.n_heads * self.n_levels * self.n_points * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=self._offset_bias_init,
            name="sampling_offsets",
        )(query).reshape(B, Q, self.n_heads, self.n_levels, self.n_points, 2)
        attw = nn.Dense(
            self.n_heads * self.n_levels * self.n_points,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Q, self.n_heads, self.n_levels * self.n_points)
        attw = nn.softmax(attw, axis=-1).reshape(
            B, Q, self.n_heads, self.n_levels, self.n_points
        )

        if refer_bbox.shape[-1] == 2:
            norm = jnp.asarray([(w, h) for h, w in value_shapes], jnp.float32)
            loc = refer_bbox[:, :, None, :, None, :] + off / norm[None, None, None, :, None, :]
        else:
            loc = (
                refer_bbox[:, :, None, :, None, :2]
                + off / self.n_points * refer_bbox[:, :, None, :, None, 2:] * 0.5
            )  # (B, Q, nh, L, P, 2)

        # sample each level
        outputs = []
        start = 0
        for li, (h, w) in enumerate(value_shapes):
            vl = v[:, start : start + h * w].reshape(B, h, w, self.n_heads, hd)
            vl = vl.transpose(0, 3, 1, 2, 4).reshape(B * self.n_heads, h, w, hd)
            grid = 2 * loc[:, :, :, li] - 1  # (B, Q, nh, P, 2)
            grid = grid.transpose(0, 2, 1, 3, 4).reshape(B * self.n_heads, Q, self.n_points, 2)
            sampled = bilinear_grid_sample(vl, grid)  # (B*nh, Q, P, hd)
            outputs.append(sampled)
            start += h * w
        stacked = jnp.stack(outputs, axis=2)  # (B*nh, Q, L, P, hd)
        wts = attw.transpose(0, 2, 1, 3, 4).reshape(
            B * self.n_heads, Q, self.n_levels, self.n_points, 1
        )
        out = (stacked * wts).sum(axis=(2, 3))  # (B*nh, Q, hd)
        out = out.reshape(B, self.n_heads, Q, hd).transpose(0, 2, 1, 3).reshape(B, Q, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (reference transformer.py:273)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 3
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, attn_mask=None, query_pos=None):
        q = k = embed if query_pos is None else embed + query_pos
        tgt = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, name="self_attn"
        )(q, k, embed, mask=attn_mask)
        embed = nn.LayerNorm(name="norm1")(embed + tgt)
        # refer_bbox (B, Q, 4) -> (B, Q, 1, 4): the level axis broadcasts
        # inside MSDeformAttn (reference passes .unsqueeze(2) likewise)
        rb = refer_bbox[:, :, None, :] if refer_bbox.ndim == 3 else refer_bbox
        tgt = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, name="cross_attn",
        )(embed if query_pos is None else embed + query_pos, rb, feats, shapes)
        embed = nn.LayerNorm(name="norm2")(embed + tgt)
        h = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(embed)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(h))
        return nn.LayerNorm(name="norm3")(embed + h)
