"""SAM weight conversion: official state-dict layout -> flax, oracle-checked.

The reference loads pretrained SAM checkpoints by state-dict name
(reference models/sam/build.py:133). No pretrained weights exist in this
zero-egress image, so the conversion path is proven the same way the repo's
other parity suites work: a synthetic state dict is generated with the
official segment-anything tensor names/layouts (torch conventions: Linear
(O,I), Conv OIHW, ConvTranspose (I,O,kh,kw)), converted with
``convert_sam_state_dict``, and the flax forward is checked against an
independent numpy oracle that computes the official forward semantics
directly from the torch-layout dict. Any wrong name, transpose, epsilon, or
activation breaks the allclose.
"""
import math

import numpy as np
import pytest

# tiny-but-structurally-complete SAM config: 2x2 patch grid, one windowed +
# one global ViT block, full prompt/decoder stacks with downsample_rate=2
IMG, PATCH = 32, 16
ED, DEPTH, HEADS, WS = 8, 2, 2, 2
GLOBAL = (1,)
OC = 8  # out_chans == prompt/decoder embed dim
TD, DHEADS, MLPD, IOUH = 8, 2, 16, 8
NT = 4  # iou? no: mask tokens (3 multimask + 1)


def rnd(rng, *shape):
    return rng.normal(0, 0.5, shape).astype(np.float32)


def make_state(rng):
    sd = {}

    def lin(name, o, i):
        sd[f"{name}.weight"] = rnd(rng, o, i)
        sd[f"{name}.bias"] = rnd(rng, o)

    def ln(name, c):
        sd[f"{name}.weight"] = 1.0 + rnd(rng, c) * 0.1
        sd[f"{name}.bias"] = rnd(rng, c) * 0.1

    # --- image encoder -----------------------------------------------------
    g = IMG // PATCH
    sd["image_encoder.pos_embed"] = rnd(rng, 1, g, g, ED)
    sd["image_encoder.patch_embed.proj.weight"] = rnd(rng, ED, 3, PATCH, PATCH) * 0.1
    sd["image_encoder.patch_embed.proj.bias"] = rnd(rng, ED)
    for b in range(DEPTH):
        p = f"image_encoder.blocks.{b}"
        ln(f"{p}.norm1", ED)
        ln(f"{p}.norm2", ED)
        lin(f"{p}.attn.qkv", 3 * ED, ED)
        lin(f"{p}.attn.proj", ED, ED)
        hd = ED // HEADS
        side = WS if b not in GLOBAL else g
        sd[f"{p}.attn.rel_pos_h"] = rnd(rng, 2 * side - 1, hd)
        sd[f"{p}.attn.rel_pos_w"] = rnd(rng, 2 * side - 1, hd)
        lin(f"{p}.mlp.lin1", 4 * ED, ED)
        lin(f"{p}.mlp.lin2", ED, 4 * ED)
    sd["image_encoder.neck.0.weight"] = rnd(rng, OC, ED, 1, 1)
    ln("image_encoder.neck.1", OC)
    sd["image_encoder.neck.2.weight"] = rnd(rng, OC, OC, 3, 3) * 0.2
    ln("image_encoder.neck.3", OC)

    # --- prompt encoder ----------------------------------------------------
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = rnd(rng, 2, OC // 2)
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = rnd(rng, 1, OC)
    sd["prompt_encoder.not_a_point_embed.weight"] = rnd(rng, 1, OC)
    sd["prompt_encoder.no_mask_embed.weight"] = rnd(rng, 1, OC)
    # mask-downscaling CNN (official Sequential 0/1/3/4/6, mask_in_chans=16)
    sd["prompt_encoder.mask_downscaling.0.weight"] = rnd(rng, 4, 1, 2, 2)
    sd["prompt_encoder.mask_downscaling.0.bias"] = rnd(rng, 4)
    ln("prompt_encoder.mask_downscaling.1", 4)
    sd["prompt_encoder.mask_downscaling.3.weight"] = rnd(rng, 16, 4, 2, 2)
    sd["prompt_encoder.mask_downscaling.3.bias"] = rnd(rng, 16)
    ln("prompt_encoder.mask_downscaling.4", 16)
    sd["prompt_encoder.mask_downscaling.6.weight"] = rnd(rng, OC, 16, 1, 1)
    sd["prompt_encoder.mask_downscaling.6.bias"] = rnd(rng, OC)

    # --- mask decoder ------------------------------------------------------
    sd["mask_decoder.iou_token.weight"] = rnd(rng, 1, TD)
    sd["mask_decoder.mask_tokens.weight"] = rnd(rng, NT, TD)
    for l in range(2):
        p = f"mask_decoder.transformer.layers.{l}"
        for attn, d in (("self_attn", TD), ("cross_attn_token_to_image", TD // 2),
                        ("cross_attn_image_to_token", TD // 2)):
            lin(f"{p}.{attn}.q_proj", d, TD)
            lin(f"{p}.{attn}.k_proj", d, TD)
            lin(f"{p}.{attn}.v_proj", d, TD)
            lin(f"{p}.{attn}.out_proj", TD, d)
        for n in range(1, 5):
            ln(f"{p}.norm{n}", TD)
        lin(f"{p}.mlp.lin1", MLPD, TD)
        lin(f"{p}.mlp.lin2", TD, MLPD)
    p = "mask_decoder.transformer.final_attn_token_to_image"
    lin(f"{p}.q_proj", TD // 2, TD)
    lin(f"{p}.k_proj", TD // 2, TD)
    lin(f"{p}.v_proj", TD // 2, TD)
    lin(f"{p}.out_proj", TD, TD // 2)
    ln("mask_decoder.transformer.norm_final_attn", TD)
    sd["mask_decoder.output_upscaling.0.weight"] = rnd(rng, TD, TD // 4, 2, 2)
    sd["mask_decoder.output_upscaling.0.bias"] = rnd(rng, TD // 4)
    ln("mask_decoder.output_upscaling.1", TD // 4)
    sd["mask_decoder.output_upscaling.3.weight"] = rnd(rng, TD // 4, TD // 8, 2, 2)
    sd["mask_decoder.output_upscaling.3.bias"] = rnd(rng, TD // 8)
    for i in range(NT):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}"
        lin(f"{p}.layers.0", TD, TD)
        lin(f"{p}.layers.1", TD, TD)
        lin(f"{p}.layers.2", TD // 8, TD)
    lin("mask_decoder.iou_prediction_head.layers.0", IOUH, TD)
    lin("mask_decoder.iou_prediction_head.layers.1", IOUH, IOUH)
    lin("mask_decoder.iou_prediction_head.layers.2", NT, IOUH)
    return sd


# ---------------------------------------------------------------------------
# numpy oracle: official forward semantics straight off the torch-layout dict
# ---------------------------------------------------------------------------

def t_lin(sd, name, x):
    return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]


def t_ln(sd, name, x, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * sd[f"{name}.weight"] + sd[f"{name}.bias"]


def gelu(x):
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def o_vit_attn(sd, pre, x, heads, side):
    """windowed/global MHSA with decomposed rel-pos; x (B, S, S, C)."""
    B, H, W, C = x.shape
    hd = C // heads
    qkv = t_lin(sd, f"{pre}.qkv", x).reshape(B, H * W, 3, heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q / math.sqrt(hd)) @ k.transpose(0, 1, 3, 2)
    # decomposed rel pos (official add_decomposed_rel_pos, equal q/k sizes)
    ih = np.arange(H)[:, None] - np.arange(H)[None, :] + (H - 1)
    iw = np.arange(W)[:, None] - np.arange(W)[None, :] + (W - 1)
    Rh, Rw = sd[f"{pre}.rel_pos_h"][ih], sd[f"{pre}.rel_pos_w"][iw]
    rq = q.reshape(B, heads, H, W, hd)
    th = np.einsum("bnhwc,hkc->bnhwk", rq, Rh)
    tw = np.einsum("bnhwc,wkc->bnhwk", rq, Rw)
    attn = attn.reshape(B, heads, H, W, H, W) + th[..., :, None] + tw[..., None, :]
    attn = softmax(attn.reshape(B, heads, H * W, H * W))
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H, W, C)
    return t_lin(sd, f"{pre}.proj", out)


def o_encoder(sd, img):
    """img (1, IMG, IMG, 3) normalized -> (1, g, g, OC)."""
    g = IMG // PATCH
    w = sd["image_encoder.patch_embed.proj.weight"]  # (ED, 3, P, P)
    patches = img.reshape(1, g, PATCH, g, PATCH, 3).transpose(0, 1, 3, 2, 4, 5)
    x = np.einsum("bhwpqc,opqc->bhwo", patches, w.transpose(0, 2, 3, 1))
    x = x + sd["image_encoder.patch_embed.proj.bias"]
    x = x + sd["image_encoder.pos_embed"][0]
    for b in range(DEPTH):
        p = f"image_encoder.blocks.{b}"
        shortcut = x
        h = t_ln(sd, f"{p}.norm1", x, 1e-6)
        if b not in GLOBAL:  # window partition (g divisible by WS here)
            B, H, W, C = h.shape
            h = h.reshape(B, H // WS, WS, W // WS, WS, C).transpose(0, 1, 3, 2, 4, 5)
            h = h.reshape(-1, WS, WS, C)
            h = o_vit_attn(sd, f"{p}.attn", h, HEADS, WS)
            h = h.reshape(B, H // WS, W // WS, WS, WS, C).transpose(0, 1, 3, 2, 4, 5)
            h = h.reshape(B, H, W, C)
        else:
            h = o_vit_attn(sd, f"{p}.attn", h, HEADS, x.shape[1])
        x = shortcut + h
        m = t_ln(sd, f"{p}.norm2", x, 1e-6)
        m = t_lin(sd, f"{p}.mlp.lin2", gelu(t_lin(sd, f"{p}.mlp.lin1", m)))
        x = x + m
    # neck: 1x1 conv -> LN2d -> 3x3 conv (pad 1) -> LN2d, both bias-free
    x = np.einsum("bhwc,oc->bhwo", x, sd["image_encoder.neck.0.weight"][:, :, 0, 0])
    x = t_ln(sd, "image_encoder.neck.1", x, 1e-6)
    w3 = sd["image_encoder.neck.2.weight"]  # (O, I, 3, 3)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros_like(x[..., : w3.shape[0]])
    H = x.shape[1]
    for dy in range(3):
        for dx in range(3):
            out = out + np.einsum(
                "bhwc,oc->bhwo", xp[:, dy : dy + H, dx : dx + H], w3[:, :, dy, dx]
            )
    return t_ln(sd, "image_encoder.neck.3", out, 1e-6)


def o_pe(sd, coords01):
    mat = sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    c = (2 * coords01 - 1) @ mat * (2 * math.pi)
    return np.concatenate([np.sin(c), np.cos(c)], -1)


def o_prompt(sd, points_px, labels):
    """points (B, P, 2), labels (B, P) -> sparse, dense, image_pe."""
    coords = (points_px + 0.5) / np.array([IMG, IMG], np.float32)
    emb = o_pe(sd, coords)
    emb = np.where(labels[..., None] == -1,
                   np.zeros_like(emb) + sd["prompt_encoder.not_a_point_embed.weight"][0],
                   emb)
    for i in range(4):
        emb = np.where(labels[..., None] == i,
                       emb + sd[f"prompt_encoder.point_embeddings.{i}.weight"][0], emb)
    g = IMG // PATCH
    dense = np.broadcast_to(
        sd["prompt_encoder.no_mask_embed.weight"][0], (points_px.shape[0], g, g, OC)
    )
    ys = (np.arange(g) + 0.5) / g
    xs = (np.arange(g) + 0.5) / g
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    image_pe = o_pe(sd, np.stack([gx, gy], -1).astype(np.float32))[None]
    return emb, dense, image_pe


def o_mask_dense(sd, mask):
    """mask (B, 4g, 4g, 1) logits -> dense embedding (B, g, g, OC) via the
    official mask_downscaling Sequential (conv2s2/LN2d/GELU x2, conv1x1)."""

    def conv(x, name, k, s):
        w = sd[f"{name}.weight"]  # (O, I, k, k)
        B, H, W, _ = x.shape
        out = np.zeros((B, H // s, W // s, w.shape[0]), np.float32)
        for dy in range(k):
            for dx in range(k):
                out = out + np.einsum(
                    "bhwi,oi->bhwo", x[:, dy::s, dx::s], w[:, :, dy, dx]
                )
        return out + sd[f"{name}.bias"]

    x = conv(mask, "prompt_encoder.mask_downscaling.0", 2, 2)
    x = gelu(t_ln(sd, "prompt_encoder.mask_downscaling.1", x, 1e-6))
    x = conv(x, "prompt_encoder.mask_downscaling.3", 2, 2)
    x = gelu(t_ln(sd, "prompt_encoder.mask_downscaling.4", x, 1e-6))
    return conv(x, "prompt_encoder.mask_downscaling.6", 1, 1)


def o_ds_attn(sd, pre, q, k, v, heads):
    qp, kp, vp = t_lin(sd, f"{pre}.q_proj", q), t_lin(sd, f"{pre}.k_proj", k), t_lin(sd, f"{pre}.v_proj", v)
    d = qp.shape[-1]
    hd = d // heads

    def sp(x):
        return x.reshape(x.shape[0], x.shape[1], heads, hd).transpose(0, 2, 1, 3)

    attn = softmax((sp(qp) / math.sqrt(hd)) @ sp(kp).transpose(0, 1, 3, 2))
    out = (attn @ sp(vp)).transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], d)
    return t_lin(sd, f"{pre}.out_proj", out)


def o_decoder(sd, emb, image_pe, sparse, dense):
    B = sparse.shape[0]
    toks = np.concatenate([
        sd["mask_decoder.iou_token.weight"], sd["mask_decoder.mask_tokens.weight"]
    ], 0)
    tokens = np.concatenate([np.broadcast_to(toks[None], (B,) + toks.shape), sparse], 1)
    g = emb.shape[1]
    src = (emb + dense).reshape(B, g * g, TD)
    key_pe = np.broadcast_to(image_pe.reshape(1, g * g, TD), src.shape)
    queries, keys = tokens, src
    for l in range(2):
        p = f"mask_decoder.transformer.layers.{l}"
        if l == 0:
            queries = o_ds_attn(sd, f"{p}.self_attn", queries, queries, queries, DHEADS)
        else:
            q = queries + tokens
            queries = queries + o_ds_attn(sd, f"{p}.self_attn", q, q, queries, DHEADS)
        queries = t_ln(sd, f"{p}.norm1", queries, 1e-5)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + o_ds_attn(sd, f"{p}.cross_attn_token_to_image", q, k, keys, DHEADS)
        queries = t_ln(sd, f"{p}.norm2", queries, 1e-5)
        queries = queries + t_lin(sd, f"{p}.mlp.lin2", gelu(t_lin(sd, f"{p}.mlp.lin1", queries)))
        queries = t_ln(sd, f"{p}.norm3", queries, 1e-5)
        q = queries + tokens
        k = keys + key_pe
        keys = keys + o_ds_attn(sd, f"{p}.cross_attn_image_to_token", k, q, queries, DHEADS)
        keys = t_ln(sd, f"{p}.norm4", keys, 1e-5)
    q = queries + tokens
    k = keys + key_pe
    queries = queries + o_ds_attn(
        sd, "mask_decoder.transformer.final_attn_token_to_image", q, k, keys, DHEADS)
    queries = t_ln(sd, "mask_decoder.transformer.norm_final_attn", queries, 1e-5)

    iou_tok, mask_toks = queries[:, 0], queries[:, 1 : 1 + NT]
    src2 = keys.reshape(B, g, g, TD)

    def convT(x, wname):
        w = sd[f"{wname}.weight"]  # (in, out, 2, 2)
        b = sd[f"{wname}.bias"]
        Bq, H, W, _ = x.shape
        out = np.zeros((Bq, 2 * H, 2 * W, w.shape[1]), np.float32)
        for a in range(2):
            for c in range(2):
                out[:, a::2, c::2] = np.einsum("bhwi,io->bhwo", x, w[:, :, a, c])
        return out + b

    up = convT(src2, "mask_decoder.output_upscaling.0")
    up = gelu(t_ln(sd, "mask_decoder.output_upscaling.1", up, 1e-6))
    up = gelu(convT(up, "mask_decoder.output_upscaling.3"))

    hyper = []
    for i in range(NT):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}"
        h = mask_toks[:, i]
        h = np.maximum(t_lin(sd, f"{p}.layers.0", h), 0)
        h = np.maximum(t_lin(sd, f"{p}.layers.1", h), 0)
        hyper.append(t_lin(sd, f"{p}.layers.2", h))
    hyper = np.stack(hyper, 1)
    masks = np.einsum("btc,bhwc->bthw", hyper, up)
    h = np.maximum(t_lin(sd, "mask_decoder.iou_prediction_head.layers.0", iou_tok), 0)
    h = np.maximum(t_lin(sd, "mask_decoder.iou_prediction_head.layers.1", h), 0)
    iou = t_lin(sd, "mask_decoder.iou_prediction_head.layers.2", h)
    return masks[:, 1:], iou[:, 1:]  # multimask slice


# ---------------------------------------------------------------------------


def build_tiny_flax():
    from yolo_contour_regression_tpu.models.sam.modules import (
        ImageEncoderViT,
        MaskDecoder,
        PromptEncoder,
    )

    enc = ImageEncoderViT(
        img_size=IMG, patch_size=PATCH, embed_dim=ED, depth=DEPTH,
        num_heads=HEADS, out_chans=OC, window_size=WS, global_attn_indexes=GLOBAL,
    )
    pe = PromptEncoder(
        embed_dim=OC, image_embedding_size=(IMG // PATCH,) * 2,
        input_image_size=(IMG, IMG),
    )
    dec = MaskDecoder(transformer_dim=TD, num_heads=DHEADS, mlp_dim=MLPD,
                      iou_head_hidden=IOUH)
    return enc, pe, dec


def test_sam_conversion_oracle_parity():
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.utils.torch_convert import (
        convert_sam_state_dict,
    )

    rng = np.random.default_rng(7)
    sd = make_state(rng)
    enc, pe, dec = build_tiny_flax()

    key = jax.random.PRNGKey(0)
    img = rng.normal(0, 1, (1, IMG, IMG, 3)).astype(np.float32)
    pts = np.array([[[9.0, 21.0], [25.0, 6.0], [0.0, 0.0]]], np.float32)
    labs = np.array([[1, 2, -1]], np.int32)

    g = IMG // PATCH
    dmask = rng.normal(0, 1, (1, 4 * g, 4 * g, 1)).astype(np.float32)
    variables = {
        "encoder": enc.init(key, jnp.asarray(img)),
        "prompt": pe.init(key, jnp.asarray(pts), jnp.asarray(labs),
                          jnp.asarray(dmask)),
        "decoder": None,
    }
    sp, dn, ipe = pe.apply(variables["prompt"], jnp.asarray(pts), jnp.asarray(labs))
    variables["decoder"] = dec.init(key, jnp.zeros((1, g, g, TD)), ipe, sp, dn)

    new_vars, report = convert_sam_state_dict(sd, variables, strict=True)
    assert report["converted"] == len(sd)
    assert not report["skipped"]

    # flax forward with converted weights
    emb = enc.apply(new_vars["encoder"], jnp.asarray(img))
    sp, dn, ipe = pe.apply(new_vars["prompt"], jnp.asarray(pts), jnp.asarray(labs))
    masks, iou = dec.apply(new_vars["decoder"], emb, ipe, sp, dn)

    # numpy oracle from the torch-layout dict
    o_emb = o_encoder(sd, img)
    np.testing.assert_allclose(np.asarray(emb), o_emb, atol=2e-4, rtol=1e-3)
    o_sp, o_dn, o_ipe = o_prompt(sd, pts, labs)
    np.testing.assert_allclose(np.asarray(sp), o_sp, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ipe), o_ipe, atol=1e-4, rtol=1e-3)
    o_masks, o_iou = o_decoder(sd, o_emb, o_ipe, o_sp, o_dn)
    np.testing.assert_allclose(np.asarray(masks), o_masks, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(iou), o_iou, atol=5e-4, rtol=1e-3)

    # mask-prompt path: dense embedding comes from the downscaling CNN
    _, dn_m, _ = pe.apply(
        new_vars["prompt"], jnp.asarray(pts), jnp.asarray(labs), jnp.asarray(dmask)
    )
    np.testing.assert_allclose(
        np.asarray(dn_m), o_mask_dense(sd, dmask), atol=5e-4, rtol=1e-3
    )
    assert not np.allclose(np.asarray(dn_m), np.asarray(dn))  # differs from no-mask


def test_sam_conversion_strict_rejects_partial():
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.utils.torch_convert import (
        convert_sam_state_dict,
    )

    rng = np.random.default_rng(3)
    sd = make_state(rng)
    sd.pop("mask_decoder.iou_token.weight")  # hole in the checkpoint
    enc, pe, dec = build_tiny_flax()
    key = jax.random.PRNGKey(0)
    pts = jnp.zeros((1, 1, 2))
    labs = jnp.zeros((1, 1), jnp.int32)
    g = IMG // PATCH
    variables = {
        "encoder": enc.init(key, jnp.zeros((1, IMG, IMG, 3))),
        "prompt": pe.init(key, pts, labs, jnp.zeros((1, 4 * g, 4 * g, 1))),
    }
    sp, dn, ipe = pe.apply(variables["prompt"], pts, labs)
    variables["decoder"] = dec.init(key, jnp.zeros((1, g, g, TD)), ipe, sp, dn)
    with pytest.raises(ValueError, match="unfilled"):
        convert_sam_state_dict(sd, variables, strict=True)


def test_sam_b_fullsize_shape_manifest():
    """Every tensor of a real sam_vit_b-shaped state dict lands in the
    full-size flax tree (shapes prove the geometry, incl. downsample_rate=2
    and the 64x64 pos_embed/rel_pos tables). Uses jax.eval_shape so the
    1024px ViT-B forward is traced, never executed."""
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.models.sam.modules import (
        ImageEncoderViT,
        MaskDecoder,
        PromptEncoder,
    )
    from yolo_contour_regression_tpu.utils.torch_convert import (
        convert_sam_state_dict,
    )

    enc = ImageEncoderViT()  # defaults == vit_b
    pe = PromptEncoder()
    dec = MaskDecoder()
    key = jax.random.PRNGKey(0)
    img = jax.ShapeDtypeStruct((1, 1024, 1024, 3), jnp.float32)
    pts = jax.ShapeDtypeStruct((1, 2, 2), jnp.float32)
    labs = jax.ShapeDtypeStruct((1, 2), jnp.int32)
    dmask = jax.ShapeDtypeStruct((1, 256, 256, 1), jnp.float32)
    variables = {
        "encoder": jax.eval_shape(enc.init, key, img),
        "prompt": jax.eval_shape(pe.init, key, pts, labs, dmask),
    }
    sp, dn, ipe = jax.eval_shape(pe.apply, variables["prompt"], pts, labs)
    emb = jax.ShapeDtypeStruct((1, 64, 64, 256), jnp.float32)
    variables["decoder"] = jax.eval_shape(dec.init, key, emb, ipe, sp, dn)

    # official sam_vit_b manifest, generated from the known architecture
    sd = {}

    def z(name, *shape):
        sd[name] = np.zeros(shape, np.float32)

    z("image_encoder.pos_embed", 1, 64, 64, 768)
    z("image_encoder.patch_embed.proj.weight", 768, 3, 16, 16)
    z("image_encoder.patch_embed.proj.bias", 768)
    for b in range(12):
        p = f"image_encoder.blocks.{b}"
        for n in ("norm1", "norm2"):
            z(f"{p}.{n}.weight", 768)
            z(f"{p}.{n}.bias", 768)
        z(f"{p}.attn.qkv.weight", 2304, 768)
        z(f"{p}.attn.qkv.bias", 2304)
        z(f"{p}.attn.proj.weight", 768, 768)
        z(f"{p}.attn.proj.bias", 768)
        side = 64 if b in (2, 5, 8, 11) else 14
        z(f"{p}.attn.rel_pos_h", 2 * side - 1, 64)
        z(f"{p}.attn.rel_pos_w", 2 * side - 1, 64)
        z(f"{p}.mlp.lin1.weight", 3072, 768)
        z(f"{p}.mlp.lin1.bias", 3072)
        z(f"{p}.mlp.lin2.weight", 768, 3072)
        z(f"{p}.mlp.lin2.bias", 768)
    z("image_encoder.neck.0.weight", 256, 768, 1, 1)
    z("image_encoder.neck.1.weight", 256)
    z("image_encoder.neck.1.bias", 256)
    z("image_encoder.neck.2.weight", 256, 256, 3, 3)
    z("image_encoder.neck.3.weight", 256)
    z("image_encoder.neck.3.bias", 256)
    z("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix", 2, 128)
    for i in range(4):
        z(f"prompt_encoder.point_embeddings.{i}.weight", 1, 256)
    z("prompt_encoder.not_a_point_embed.weight", 1, 256)
    z("prompt_encoder.no_mask_embed.weight", 1, 256)
    z("prompt_encoder.mask_downscaling.0.weight", 4, 1, 2, 2)
    z("prompt_encoder.mask_downscaling.0.bias", 4)
    z("prompt_encoder.mask_downscaling.1.weight", 4)
    z("prompt_encoder.mask_downscaling.1.bias", 4)
    z("prompt_encoder.mask_downscaling.3.weight", 16, 4, 2, 2)
    z("prompt_encoder.mask_downscaling.3.bias", 16)
    z("prompt_encoder.mask_downscaling.4.weight", 16)
    z("prompt_encoder.mask_downscaling.4.bias", 16)
    z("prompt_encoder.mask_downscaling.6.weight", 256, 16, 1, 1)
    z("prompt_encoder.mask_downscaling.6.bias", 256)
    for l in range(2):
        p = f"mask_decoder.transformer.layers.{l}"
        for attn, d in (("self_attn", 256), ("cross_attn_token_to_image", 128),
                        ("cross_attn_image_to_token", 128)):
            for proj, o, i in ((f"q_proj", d, 256), ("k_proj", d, 256),
                               ("v_proj", d, 256), ("out_proj", 256, d)):
                z(f"{p}.{attn}.{proj}.weight", o, i)
                z(f"{p}.{attn}.{proj}.bias", o)
        for n in range(1, 5):
            z(f"{p}.norm{n}.weight", 256)
            z(f"{p}.norm{n}.bias", 256)
        z(f"{p}.mlp.lin1.weight", 2048, 256)
        z(f"{p}.mlp.lin1.bias", 2048)
        z(f"{p}.mlp.lin2.weight", 256, 2048)
        z(f"{p}.mlp.lin2.bias", 256)
    p = "mask_decoder.transformer.final_attn_token_to_image"
    for proj, o, i in (("q_proj", 128, 256), ("k_proj", 128, 256),
                       ("v_proj", 128, 256), ("out_proj", 256, 128)):
        z(f"{p}.{proj}.weight", o, i)
        z(f"{p}.{proj}.bias", o)
    z("mask_decoder.transformer.norm_final_attn.weight", 256)
    z("mask_decoder.transformer.norm_final_attn.bias", 256)
    z("mask_decoder.iou_token.weight", 1, 256)
    z("mask_decoder.mask_tokens.weight", 4, 256)
    z("mask_decoder.output_upscaling.0.weight", 256, 64, 2, 2)
    z("mask_decoder.output_upscaling.0.bias", 64)
    z("mask_decoder.output_upscaling.1.weight", 64)
    z("mask_decoder.output_upscaling.1.bias", 64)
    z("mask_decoder.output_upscaling.3.weight", 64, 32, 2, 2)
    z("mask_decoder.output_upscaling.3.bias", 32)
    for i in range(4):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}"
        z(f"{p}.layers.0.weight", 256, 256)
        z(f"{p}.layers.0.bias", 256)
        z(f"{p}.layers.1.weight", 256, 256)
        z(f"{p}.layers.1.bias", 256)
        z(f"{p}.layers.2.weight", 32, 256)
        z(f"{p}.layers.2.bias", 32)
    z("mask_decoder.iou_prediction_head.layers.0.weight", 256, 256)
    z("mask_decoder.iou_prediction_head.layers.0.bias", 256)
    z("mask_decoder.iou_prediction_head.layers.1.weight", 256, 256)
    z("mask_decoder.iou_prediction_head.layers.1.bias", 256)
    z("mask_decoder.iou_prediction_head.layers.2.weight", 4, 256)
    z("mask_decoder.iou_prediction_head.layers.2.bias", 4)

    # strict=True raises unless every source tensor lands AND every target
    # leaf is filled — passing IS the assertion
    new_vars, report = convert_sam_state_dict(sd, variables, strict=True)
    assert report["converted"] == len(sd)
    assert not report["missed"] and not report["unmatched_target"]
