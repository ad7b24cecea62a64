"""SAM network modules — flax.linen.

Re-implementation of the reference ``models/sam/modules/`` (encoders.py
ImageEncoderViT/PromptEncoder, decoders.py MaskDecoder, transformer.py
TwoWayTransformer; 2739 LoC total): ViT image encoder with windowed + global
attention and a conv neck; point/box/mask prompt encoder with random-Fourier
positional encoding; two-way transformer mask decoder with IoU prediction and
hypernetwork mask heads. NHWC layout, static shapes.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _gelu(x):
    # exact (erf) gelu: torch nn.GELU's default, which the official SAM
    # checkpoints were trained with — jax's default tanh approximation
    # differs by ~1e-3, enough to break weight-conversion parity
    return nn.gelu(x, approximate=False)


class MLPBlock(nn.Module):
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = _gelu(nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x))
        return nn.Dense(d, dtype=self.dtype, name="lin2")(h)


def window_partition(x, ws: int):
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    wins = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return wins, (Hp, Wp)


def window_unpartition(wins, ws: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = wins.shape[0] // (Hp // ws * Wp // ws)
    x = wins.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class Attention(nn.Module):
    """MHSA with optional decomposed relative positional embeddings
    (reference sam encoders Attention + add_decomposed_rel_pos)."""

    num_heads: int = 8
    use_rel_pos: bool = False
    input_size: Optional[Tuple[int, int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, HW, hd)
        attn = (q * (hd**-0.5)) @ k.transpose(0, 1, 3, 2)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * H - 1, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * W - 1, hd))
            ih = jnp.arange(H)[:, None] - jnp.arange(H)[None, :] + (H - 1)
            iw = jnp.arange(W)[:, None] - jnp.arange(W)[None, :] + (W - 1)
            Rh = rel_h[ih]  # (H, H, hd)
            Rw = rel_w[iw]  # (W, W, hd)
            r_q = q.reshape(B, self.num_heads, H, W, hd)
            rel_h_term = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
            rel_w_term = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
            attn = attn.reshape(B, self.num_heads, H, W, H, W)
            attn = attn + rel_h_term[..., :, None] + rel_w_term[..., None, :]
            attn = attn.reshape(B, self.num_heads, H * W, H * W)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0
    use_rel_pos: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        # official encoder ViT blocks use eps=1e-6 (build_sam norm_layer)
        x = nn.LayerNorm(name="norm1")(x)
        if self.window_size > 0:
            x, pad_hw = window_partition(x, self.window_size)
        x = Attention(
            self.num_heads, self.use_rel_pos,
            input_size=(self.window_size, self.window_size) if self.window_size else (H, W),
            dtype=self.dtype, name="attn",
        )(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        return x + MLPBlock(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            nn.LayerNorm(name="norm2")(x)
        )


class ImageEncoderViT(nn.Module):
    """(reference models/sam/modules/encoders.py ImageEncoderViT)."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        hp = wp = self.img_size // self.patch_size
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, hp, wp, self.embed_dim)
        )
        x = x + pos[:, : x.shape[1], : x.shape[2]]
        for i in range(self.depth):
            x = ViTBlock(
                self.num_heads,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                dtype=self.dtype, name=f"block{i}",
            )(x)
        # neck: 1x1 -> LN -> 3x3 -> LN
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck0")(x)
        x = nn.LayerNorm(name="neck_ln0")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="neck1")(x)
        return nn.LayerNorm(name="neck_ln1")(x)  # (B, h, w, 256)


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (reference encoders.py
    PositionEmbeddingRandom)."""

    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords_norm):
        """coords_norm (..., 2) in [0,1] -> (..., 2*num_pos_feats)."""
        mat = self.param(
            "positional_encoding_gaussian_matrix",
            lambda k, s: jax.random.normal(k, s) * self.scale,
            (2, self.num_pos_feats),
        )
        c = 2 * coords_norm - 1
        c = c @ mat * (2 * math.pi)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], -1)

    def grid(self, h: int, w: int):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        return self(jnp.stack([gx, gy], -1))  # (h, w, C)


class PromptEncoder(nn.Module):
    """Point/box/mask prompts -> sparse + dense embeddings
    (reference encoders.py PromptEncoder). Points carry labels:
    1 fg, 0 bg, 2/3 box corners, -1 padding. Low-res mask prompts
    (B, 4h, 4w, 1) logits go through the mask-downscaling CNN
    (reference encoders.py:151: conv2s2 -> LN -> GELU -> conv2s2 -> LN
    -> GELU -> conv1x1) to become the dense embedding; without one the
    learned ``no_mask`` embedding is broadcast instead."""

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.pe = PositionEmbeddingRandom(self.embed_dim // 2, name="pe_layer")
        self.point_embeddings = [
            self.param(f"point_embed{i}", nn.initializers.normal(1.0), (1, self.embed_dim))
            for i in range(4)
        ]
        self.not_a_point = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        mic = self.mask_in_chans
        self.mask_down0 = nn.Conv(
            mic // 4, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype
        )
        self.mask_ln0 = nn.LayerNorm()
        self.mask_down1 = nn.Conv(
            mic, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype
        )
        self.mask_ln1 = nn.LayerNorm()
        self.mask_down2 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)

    def __call__(self, points, labels, masks=None):
        """points (B, P, 2) px, labels (B, P) int, masks optional
        (B, 4h, 4w, 1) low-res logits -> sparse (B, P, C),
        dense (B, h, w, C), image_pe (1, h, w, C)."""
        h, w = self.image_embedding_size
        ih, iw = self.input_image_size
        coords = (points + 0.5) / jnp.asarray([iw, ih], jnp.float32)
        emb = self.pe(coords)  # (B, P, C)
        emb = jnp.where(labels[..., None] == -1, self.not_a_point[0], emb)
        for i in range(4):
            emb = jnp.where(
                labels[..., None] == i, emb + self.point_embeddings[i][0], emb
            )
        emb = jnp.where(labels[..., None] == -1,
                        jnp.zeros_like(emb) + self.not_a_point[0], emb)
        if masks is not None:
            x = _gelu(self.mask_ln0(self.mask_down0(masks)))
            x = _gelu(self.mask_ln1(self.mask_down1(x)))
            dense = self.mask_down2(x)
        else:
            dense = jnp.broadcast_to(
                self.no_mask[0][None, None, None, :],
                (points.shape[0], h, w, self.embed_dim),
            )
        image_pe = self.pe.grid(h, w)[None]
        return emb, dense, image_pe


class DownsampleAttention(nn.Module):
    """Decoder attention with explicit q/k/v/out projections whose internal
    width is ``C // downsample_rate`` (reference transformer.py Attention).
    The official SAM checkpoints use downsample_rate=2 on every cross- and
    final-attention (internal dim 128 at C=256) — the projection weight
    shapes depend on it, so matching it is a hard requirement for loading
    converted weights (utils/torch_convert.py:convert_sam_state_dict)."""

    num_heads: int = 8
    downsample_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        C = q.shape[-1]
        d = C // self.downsample_rate
        hd = d // self.num_heads
        qp = nn.Dense(d, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(d, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(d, dtype=self.dtype, name="v_proj")(v)

        def heads(x):
            return x.reshape(*x.shape[:2], self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qp), heads(kp), heads(vp)
        attn = nn.softmax((qh / math.sqrt(hd)) @ kh.transpose(0, 1, 3, 2), axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(*q.shape[:2], d)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """(reference transformer.py TwoWayAttentionBlock)."""

    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        def mha(name, ds=1):
            return DownsampleAttention(
                self.num_heads, downsample_rate=ds, dtype=self.dtype, name=name
            )

        ds = self.attention_downsample_rate
        if self.skip_first_layer_pe:
            queries = mha("self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + mha("self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + mha("cross_attn_token_to_image", ds)(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)
        queries = queries + MLPBlock(self.mlp_dim, dtype=self.dtype, name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + mha("cross_attn_image_to_token", ds)(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        B, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(B, h * w, c)
        key_pe = jnp.broadcast_to(image_pe.reshape(1, h * w, c), keys.shape)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.num_heads, self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=i == 0,
                dtype=self.dtype, name=f"layer{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        attn = DownsampleAttention(
            self.num_heads, downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype, name="final_attn",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final")(queries + attn)
        return queries, keys


class MaskDecoder(nn.Module):
    """(reference decoders.py MaskDecoder): IoU token + 4 mask tokens through
    a TwoWayTransformer; upscale 4x; hypernetwork per-token MLPs."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    num_heads: int = 8
    mlp_dim: int = 2048
    iou_head_hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool = True):
        num_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (num_tokens, self.transformer_dim)
        )
        B = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], 0)[None],
            (B, 1 + num_tokens, self.transformer_dim),
        )
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)
        src = image_embeddings + dense_prompt
        hs, keys = TwoWayTransformer(
            num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            dtype=self.dtype, name="transformer",
        )(src, image_pe, tokens)
        iou_tok_out = hs[:, 0]
        mask_toks = hs[:, 1 : 1 + num_tokens]

        h, w = image_embeddings.shape[1:3]
        src2 = keys.reshape(B, h, w, self.transformer_dim)
        up = nn.ConvTranspose(
            self.transformer_dim // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="upscale0",
        )(src2)
        up = _gelu(nn.LayerNorm(name="upscale_ln")(up))
        up = nn.ConvTranspose(
            self.transformer_dim // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="upscale1",
        )(up)
        up = _gelu(up)  # (B, 4h, 4w, C/8)

        hyper = []
        for i in range(num_tokens):
            from ...nn.modules.transformer import MLP

            hyper.append(
                MLP(self.transformer_dim, self.transformer_dim // 8, 3,
                    dtype=self.dtype, name=f"hyper{i}")(mask_toks[:, i])
            )
        hyper = jnp.stack(hyper, 1)  # (B, T, C/8)
        masks = jnp.einsum("btc,bhwc->bthw", hyper, up)
        from ...nn.modules.transformer import MLP

        iou_pred = MLP(self.iou_head_hidden, num_tokens, 3,
                       dtype=self.dtype, name="iou_head")(iou_tok_out)
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]
