"""MobileSAM (TinyViT) weight conversion: official layout -> flax, oracle-checked.

Same methodology as test_sam_convert.py, for the TinyViT encoder behind
``mobile_sam.pt`` (reference models/sam/modules/tiny_encoder.py, built by
build.py:build_mobile_sam): a synthetic state dict in the official tensor
naming/layout is converted with ``convert_sam_state_dict`` (which routes
TinyViT keys through ``_sam_map_key_tiny``, incl. BatchNorm running stats
into batch_stats), and the flax forward is checked against an independent
numpy oracle computing the original semantics — Conv+BN stages, MBConv,
patch merging (stride-1 final merge), TinyViT attention with the
first-encounter |offset| bias table, window pad/crop, local conv, pre-norm
MLP, SAM neck.
"""
import itertools
import math

import numpy as np
import pytest

IMG = 32
ED = (6, 8, 10, 12)
DEPTHS = (1, 1, 1, 1)
HEADS = (2, 2, 2, 2)
WS = (3, 3, 2, 2)  # layer1 ws=3 on res 4 exercises the pad/crop path


def rnd(rng, *shape):
    return rng.normal(0, 0.4, shape).astype(np.float32)


def make_state(rng):
    sd = {}

    def convbn(name, o, i, k, groups=1):
        sd[f"{name}.c.weight"] = rnd(rng, o, i // groups, k, k) * 0.3
        sd[f"{name}.bn.weight"] = 1.0 + rnd(rng, o) * 0.1
        sd[f"{name}.bn.bias"] = rnd(rng, o) * 0.1
        sd[f"{name}.bn.running_mean"] = rnd(rng, o) * 0.1
        sd[f"{name}.bn.running_var"] = 1.0 + rnd(rng, o) * 0.1
        sd[f"{name}.bn.num_batches_tracked"] = np.asarray(7)

    def lin(name, o, i):
        sd[f"{name}.weight"] = rnd(rng, o, i)
        sd[f"{name}.bias"] = rnd(rng, o)

    def ln(name, c):
        sd[f"{name}.weight"] = 1.0 + rnd(rng, c) * 0.1
        sd[f"{name}.bias"] = rnd(rng, c) * 0.1

    p = "image_encoder"
    convbn(f"{p}.patch_embed.seq.0", ED[0] // 2, 3, 3)
    convbn(f"{p}.patch_embed.seq.2", ED[0], ED[0] // 2, 3)
    # layer0: MBConv blocks + downsample
    for j in range(DEPTHS[0]):
        b = f"{p}.layers.0.blocks.{j}"
        h = ED[0] * 4
        convbn(f"{b}.conv1", h, ED[0], 1)
        convbn(f"{b}.conv2", h, h, 3, groups=h)
        convbn(f"{b}.conv3", ED[0], h, 1)
    for li, (din, dout) in enumerate(((ED[0], ED[1]), (ED[1], ED[2]), (ED[2], ED[3]))):
        d = f"{p}.layers.{li}.downsample"
        convbn(f"{d}.conv1", dout, din, 1)
        convbn(f"{d}.conv2", dout, dout, 3, groups=dout)
        convbn(f"{d}.conv3", dout, dout, 1)
    # layers 1..3: attention blocks
    for li in (1, 2, 3):
        dim, nh, ws = ED[li], HEADS[li], WS[li]
        kd = dim // nh
        n_off = len({(abs(a - c), abs(b - e))
                     for a, b in itertools.product(range(ws), range(ws))
                     for c, e in itertools.product(range(ws), range(ws))})
        for j in range(DEPTHS[li]):
            b = f"{p}.layers.{li}.blocks.{j}"
            ln(f"{b}.attn.norm", dim)
            lin(f"{b}.attn.qkv", nh * 3 * kd, dim)  # attn_ratio=1: d == kd
            lin(f"{b}.attn.proj", dim, nh * kd)
            sd[f"{b}.attn.attention_biases"] = rnd(rng, nh, n_off)
            convbn(f"{b}.local_conv", dim, dim, 3, groups=dim)
            ln(f"{b}.mlp.norm", dim)
            lin(f"{b}.mlp.fc1", dim * 4, dim)
            lin(f"{b}.mlp.fc2", dim, dim * 4)
    # classifier head: present in checkpoints, skipped by conversion
    ln(f"{p}.norm_head", ED[3])
    lin(f"{p}.head", 10, ED[3])
    # SAM neck
    sd[f"{p}.neck.0.weight"] = rnd(rng, 8, ED[3], 1, 1)
    ln(f"{p}.neck.1", 8)
    sd[f"{p}.neck.2.weight"] = rnd(rng, 8, 8, 3, 3) * 0.2
    ln(f"{p}.neck.3", 8)
    return sd


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------

def gelu(x):
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))


def conv2d(x, w, stride=1, pad=0, groups=1):
    """NHWC input, torch-layout weight (O, I/groups, kh, kw)."""
    B, H, W, C = x.shape
    O, cg, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Ho = (H + 2 * pad - kh) // stride + 1
    Wo = (W + 2 * pad - kw) // stride + 1
    out = np.zeros((B, Ho, Wo, O), np.float32)
    gin, gout = C // groups, O // groups
    for g in range(groups):
        xg = xp[..., g * gin : (g + 1) * gin]
        wg = w[g * gout : (g + 1) * gout]
        for a in range(kh):
            for b in range(kw):
                xs = xg[:, a : a + Ho * stride : stride, b : b + Wo * stride : stride]
                out[..., g * gout : (g + 1) * gout] += np.einsum(
                    "bhwc,oc->bhwo", xs, wg[:, :, a, b])
    return out


def o_convbn(sd, name, x, stride=1, pad=0, groups=1):
    y = conv2d(x, sd[f"{name}.c.weight"], stride, pad, groups)
    m, v = sd[f"{name}.bn.running_mean"], sd[f"{name}.bn.running_var"]
    return (y - m) / np.sqrt(v + 1e-5) * sd[f"{name}.bn.weight"] + sd[f"{name}.bn.bias"]


def t_lin(sd, name, x):
    return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]


def t_ln(sd, name, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * sd[f"{name}.weight"] + sd[f"{name}.bias"]


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def o_attn(sd, pre, x, nh, ws):
    """x (nW, N, C) windows; official Attention with bias table."""
    C = x.shape[-1]
    kd = C // nh
    x = t_ln(sd, f"{pre}.norm", x)
    qkv = t_lin(sd, f"{pre}.qkv", x)  # (nW, N, nh*3kd)
    nW, N, _ = qkv.shape
    qkv = qkv.reshape(nW, N, nh, 3 * kd)
    q, k, v = qkv[..., :kd], qkv[..., kd : 2 * kd], qkv[..., 2 * kd :]
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    # official first-encounter offset indexing
    points = list(itertools.product(range(ws), range(ws)))
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    ab = sd[f"{pre}.attention_biases"][:, np.asarray(idxs).reshape(N, N)]
    attn = softmax(q @ k.transpose(0, 1, 3, 2) * (kd ** -0.5) + ab[None])
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(nW, N, nh * kd)
    return t_lin(sd, f"{pre}.proj", out)


def o_block(sd, pre, x, nh, ws):
    B, H, W, C = x.shape
    shortcut = x
    if H == ws and W == ws:
        y = o_attn(sd, f"{pre}.attn", x.reshape(B, H * W, C), nh, ws).reshape(B, H, W, C)
    else:
        pb, pr = (ws - H % ws) % ws, (ws - W % ws) % ws
        xp = np.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)))
        pH, pW = H + pb, W + pr
        wins = xp.reshape(B, pH // ws, ws, pW // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        wins = wins.reshape(-1, ws * ws, C)
        wins = o_attn(sd, f"{pre}.attn", wins, nh, ws)
        y = wins.reshape(B, pH // ws, pW // ws, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(B, pH, pW, C)[:, :H, :W]
    x = shortcut + y
    x = o_convbn(sd, f"{pre}.local_conv", x, 1, 1, groups=C)
    m = t_ln(sd, f"{pre}.mlp.norm", x)
    m = t_lin(sd, f"{pre}.mlp.fc2", gelu(t_lin(sd, f"{pre}.mlp.fc1", m)))
    return x + m


def o_merge(sd, pre, x, stride):
    C = sd[f"{pre}.conv1.c.weight"].shape[0]
    x = gelu(o_convbn(sd, f"{pre}.conv1", x))
    x = gelu(o_convbn(sd, f"{pre}.conv2", x, stride, 1, groups=C))
    return o_convbn(sd, f"{pre}.conv3", x)


def o_encoder(sd, img):
    p = "image_encoder"
    x = gelu(o_convbn(sd, f"{p}.patch_embed.seq.0", img, 2, 1))
    x = o_convbn(sd, f"{p}.patch_embed.seq.2", x, 2, 1)
    for j in range(DEPTHS[0]):
        b = f"{p}.layers.0.blocks.{j}"
        h = ED[0] * 4
        y = gelu(o_convbn(sd, f"{b}.conv1", x))
        y = gelu(o_convbn(sd, f"{b}.conv2", y, 1, 1, groups=h))
        y = o_convbn(sd, f"{b}.conv3", y)
        x = gelu(x + y)
    x = o_merge(sd, f"{p}.layers.0.downsample", x, 2)
    for li, stride in ((1, 2), (2, 1)):
        for j in range(DEPTHS[li]):
            x = o_block(sd, f"{p}.layers.{li}.blocks.{j}", x, HEADS[li], WS[li])
        x = o_merge(sd, f"{p}.layers.{li}.downsample", x, stride)
    for j in range(DEPTHS[3]):
        x = o_block(sd, f"{p}.layers.3.blocks.{j}", x, HEADS[3], WS[3])
    # neck
    x = np.einsum("bhwc,oc->bhwo", x, sd[f"{p}.neck.0.weight"][:, :, 0, 0])
    x = t_ln(sd, f"{p}.neck.1", x, 1e-6)
    x = conv2d(x, sd[f"{p}.neck.2.weight"], 1, 1)
    return t_ln(sd, f"{p}.neck.3", x, 1e-6)


# ---------------------------------------------------------------------------


def test_mobilesam_tinyvit_conversion_oracle_parity():
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.models.sam.tinyvit import TinyViT
    from yolo_contour_regression_tpu.utils.torch_convert import (
        convert_sam_state_dict,
    )

    rng = np.random.default_rng(5)
    sd = make_state(rng)
    enc = TinyViT(img_size=IMG, embed_dims=ED, depths=DEPTHS,
                  num_heads=HEADS, window_sizes=WS, out_chans=8)
    img = rng.normal(0, 1, (1, IMG, IMG, 3)).astype(np.float32)
    variables = {"encoder": enc.init(jax.random.PRNGKey(0), jnp.asarray(img))}

    new_vars, report = convert_sam_state_dict(sd, variables, strict=True)
    # head/norm_head + num_batches_tracked skipped, everything else lands
    assert any("norm_head" in k for k in report["skipped"])
    assert not report["missed"] and not report["unmatched_target"]

    emb = enc.apply(new_vars["encoder"], jnp.asarray(img))
    o_emb = o_encoder(sd, img)
    assert emb.shape == o_emb.shape == (1, IMG // 16, IMG // 16, 8)
    np.testing.assert_allclose(np.asarray(emb), o_emb, atol=5e-4, rtol=1e-3)


def test_mobilesam_fullsize_shape_manifest():
    """Full tiny_vit_5m geometry (dims 64/128/160/320, depths 2/2/6/2, heads
    2/4/5/10, windows 7/7/14/7, img 1024): every tensor of a
    mobile_sam-shaped encoder state dict lands, via jax.eval_shape."""
    import itertools as it

    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.models.sam.tinyvit import TinyViT
    from yolo_contour_regression_tpu.utils.torch_convert import (
        convert_sam_state_dict,
    )

    dims, depths, heads, wins = (64, 128, 160, 320), (2, 2, 6, 2), (2, 4, 5, 10), (7, 7, 14, 7)
    sd = {}

    def z(name, *shape):
        sd[name] = np.zeros(shape, np.float32)

    def convbn(name, o, i, k, groups=1):
        z(f"{name}.c.weight", o, i // groups, k, k)
        for s in ("weight", "bias", "running_mean", "running_var"):
            z(f"{name}.bn.{s}", o)

    def n_off(ws):
        return len({(abs(a - c), abs(b - d))
                    for a, b in it.product(range(ws), range(ws))
                    for c, d in it.product(range(ws), range(ws))})

    p = "image_encoder"
    convbn(f"{p}.patch_embed.seq.0", 32, 3, 3)
    convbn(f"{p}.patch_embed.seq.2", 64, 32, 3)
    for j in range(depths[0]):
        b = f"{p}.layers.0.blocks.{j}"
        convbn(f"{b}.conv1", 256, 64, 1)
        convbn(f"{b}.conv2", 256, 256, 3, groups=256)
        convbn(f"{b}.conv3", 64, 256, 1)
    for li, (din, dout) in enumerate(((64, 128), (128, 160), (160, 320))):
        d = f"{p}.layers.{li}.downsample"
        convbn(f"{d}.conv1", dout, din, 1)
        convbn(f"{d}.conv2", dout, dout, 3, groups=dout)
        convbn(f"{d}.conv3", dout, dout, 1)
    for li in (1, 2, 3):
        dim, nh, ws = dims[li], heads[li], wins[li]
        kd = dim // nh
        for j in range(depths[li]):
            b = f"{p}.layers.{li}.blocks.{j}"
            z(f"{b}.attn.norm.weight", dim)
            z(f"{b}.attn.norm.bias", dim)
            z(f"{b}.attn.qkv.weight", nh * 3 * kd, dim)
            z(f"{b}.attn.qkv.bias", nh * 3 * kd)
            z(f"{b}.attn.proj.weight", dim, nh * kd)
            z(f"{b}.attn.proj.bias", dim)
            z(f"{b}.attn.attention_biases", nh, n_off(ws))
            convbn(f"{b}.local_conv", dim, dim, 3, groups=dim)
            z(f"{b}.mlp.norm.weight", dim)
            z(f"{b}.mlp.norm.bias", dim)
            z(f"{b}.mlp.fc1.weight", dim * 4, dim)
            z(f"{b}.mlp.fc1.bias", dim * 4)
            z(f"{b}.mlp.fc2.weight", dim, dim * 4)
            z(f"{b}.mlp.fc2.bias", dim)
    z(f"{p}.neck.0.weight", 256, 320, 1, 1)
    z(f"{p}.neck.1.weight", 256)
    z(f"{p}.neck.1.bias", 256)
    z(f"{p}.neck.2.weight", 256, 256, 3, 3)
    z(f"{p}.neck.3.weight", 256)
    z(f"{p}.neck.3.bias", 256)

    enc = TinyViT()  # defaults == tiny_vit_5m @ 1024
    img = jax.ShapeDtypeStruct((1, 1024, 1024, 3), jnp.float32)
    variables = {"encoder": jax.eval_shape(enc.init, jax.random.PRNGKey(0), img)}
    new_vars, report = convert_sam_state_dict(sd, variables, strict=True)
    assert report["converted"] == len(
        [k for k in sd if "num_batches" not in k]
    )
    assert not report["missed"] and not report["unmatched_target"]
