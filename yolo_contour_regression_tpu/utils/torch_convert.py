"""Torch checkpoint migration: reference ``.pt`` weights -> this framework.

Users of the reference (ai4in/YOLO-Contour-Regression, an Ultralytics 8.0.149
fork) hold trained ``.pt`` checkpoints — pickled torch ``DetectionModel``
objects (reference nn/tasks.py:553 torch_safe_load). This module loads them
WITHOUT the ultralytics package (a tolerant unpickler stubs the missing
classes; tensors still deserialize through torch's own machinery), maps the
torch parameter names onto this framework's flax param tree, and writes a
native ``.ckpt``:

  torch layout                          this framework
  ------------------------------------  --------------------------------
  model.{i}.conv.weight (OIHW)          params.layer{i}.conv.kernel (HWIO)
  model.{i}.bn.{weight,bias}            params.layer{i}.bn.{scale,bias}
  model.{i}.bn.running_{mean,var}       batch_stats.layer{i}.bn.{mean,var}
  model.{i}.m.{j}.cv1...                layer{i}.m{j}.cv1...
  model.{i}.cv2.{a}.{b}...   (heads)    layer{i}[.detect].cv2_{a}_{b}...
  RepConv conv1.conv/conv1.bn/...,bn    conv1/bn1, conv2/bn2, bn_id
  Linear weight (O,I)                   kernel (I,O)
  model.{i}.dfl.conv.weight             (none: DFL projection is arithmetic)

Requires the ``torch`` package only to READ the file (CPU); conversion and
the resulting checkpoint are torch-free.
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from . import LOGGER


# ---------------------------------------------------------------------------
# tolerant .pt loading
# ---------------------------------------------------------------------------

def _make_stub(module: str, name: str):
    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    return type(name, (), {"__setstate__": __setstate__, "_stub_origin": f"{module}.{name}"})


class _TolerantUnpickler(pickle.Unpickler):
    """Resolves importable classes normally; unknown ones become stubs that
    just capture their pickled __dict__ (enough to walk _modules/_parameters)."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _make_stub(module, name)


class _PickleShim:
    Unpickler = _TolerantUnpickler
    load = staticmethod(pickle.load)
    loads = staticmethod(pickle.loads)


def load_torch_checkpoint(path) -> Dict[str, Any]:
    """torch.load a reference .pt without ultralytics installed. Returns the
    raw checkpoint dict (keys like 'model', 'ema', 'train_args', ...)."""
    import torch

    obj = torch.load(str(path), map_location="cpu", pickle_module=_PickleShim,
                     weights_only=False)
    return obj if isinstance(obj, dict) else {"model": obj}


def _walk_module(obj, prefix: str, out: Dict[str, np.ndarray]):
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return
    for coll in ("_parameters", "_buffers"):
        for k, v in (d.get(coll) or {}).items():
            if v is None:
                continue
            arr = v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v)
            out[f"{prefix}{k}"] = arr
    for k, child in (d.get("_modules") or {}).items():
        _walk_module(child, f"{prefix}{k}.", out)


def extract_state_dict(ckpt: Dict[str, Any], prefer_ema: bool = True) -> Dict[str, np.ndarray]:
    """Flat name->float32 numpy state dict from a stub-loaded checkpoint
    (EMA weights preferred, like reference attempt_load_one_weight)."""
    model = None
    if prefer_ema and ckpt.get("ema") is not None:
        model = ckpt["ema"]
    if model is None:
        model = ckpt.get("model", ckpt)
    out: Dict[str, np.ndarray] = {}
    if isinstance(model, dict):  # plain state_dict
        for k, v in model.items():
            out[k] = v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v)
        return out
    _walk_module(model, "", out)
    return out


# ---------------------------------------------------------------------------
# name mapping
# ---------------------------------------------------------------------------

# list-attribute names whose numeric index concatenates WITHOUT an underscore
# (Bottleneck/RepBlock chains: our modules name them m0, m1, ...)
_CONCAT_LISTS = {"m"}
# RepConv submodule renames (torch Conv-in-RepConv -> our flat names)
_REPCONV_MAP = {
    ("conv1", "conv"): ("conv1",),
    ("conv1", "bn"): ("bn1",),
    ("conv2", "conv"): ("conv2",),
    ("conv2", "bn"): ("bn2",),
    ("bn",): ("bn_id",),
}


def _translate_tokens(tokens):
    """torch dotted sub-path -> candidate flax module paths (most-direct
    first; RepConv renames as alternatives probed against the target tree,
    since e.g. a bare 'bn' is an ordinary Conv BN in one layer and RepConv's
    identity BN in another)."""
    outp = []
    for t in tokens:
        if t.isdigit() and outp:
            prev = outp[-1]
            outp[-1] = f"{prev}{t}" if prev in _CONCAT_LISTS else f"{prev}_{t}"
        else:
            outp.append(t)
    cands = [tuple(outp)]
    for pat, rep in _REPCONV_MAP.items():
        L = len(pat)
        if len(outp) >= L and tuple(outp[-L:]) == pat:
            cands.append(tuple(outp[:-L]) + rep)
    return cands


def _leaf_map(leaf: str, arr: np.ndarray, in_bn: bool):
    """torch tensor name -> (our leaf name, collection, transformed array)."""
    if leaf == "num_batches_tracked":
        return None
    if in_bn:
        return {
            "weight": ("scale", "params", arr),
            "bias": ("bias", "params", arr),
            "running_mean": ("mean", "batch_stats", arr),
            "running_var": ("var", "batch_stats", arr),
        }.get(leaf)
    if leaf == "weight":
        if arr.ndim == 4:  # conv OIHW -> HWIO
            return ("kernel", "params", np.transpose(arr, (2, 3, 1, 0)))
        if arr.ndim == 2:  # linear (O,I) -> (I,O)
            return ("kernel", "params", arr.T)
        return ("scale", "params", arr)  # LayerNorm etc.
    if leaf == "bias":
        return ("bias", "params", arr)
    return (leaf, "params", arr)


def _get(tree, path):
    cur = tree
    for p in path:
        if not isinstance(cur, dict) or p not in cur:
            return None
        cur = cur[p]
    return cur


def _set(tree, path, value):
    cur = tree
    for p in path[:-1]:
        cur = cur.setdefault(p, {})
    cur[path[-1]] = value


def convert_state_dict(
    state: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    strict: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map a torch state dict onto a freshly-initialized param tree.

    Returns (new_variables, report). report = {converted, skipped, missed,
    unmatched_target}; strict=True raises when any source tensor with a
    learnable mapping finds no home."""
    import copy

    new_vars = {
        "params": copy.deepcopy(dict(variables["params"])),
        "batch_stats": copy.deepcopy(dict(variables.get("batch_stats", {}))),
    }
    converted, skipped, missed = [], [], []
    touched = set()

    for key, arr in state.items():
        tokens = key.split(".")
        if tokens and tokens[0] == "model":
            tokens = tokens[1:]
        if not tokens or not tokens[0].isdigit():
            skipped.append(key)
            continue
        layer = f"layer{tokens[0]}"
        sub, leaf = tokens[1:-1], tokens[-1]
        if sub and sub[-1] == "dfl" or (len(sub) >= 2 and sub[-2] == "dfl"):
            skipped.append(key)  # DFL projection is arithmetic here
            continue
        in_bn = bool(sub) and sub[-1].startswith("bn")
        mapped = _leaf_map(leaf, arr, in_bn)
        if mapped is None:
            skipped.append(key)
            continue
        leaf_name, coll, new_arr = mapped
        candidates = []
        for path_mid in _translate_tokens(sub):
            candidates.append((layer,) + path_mid + (leaf_name,))
            # heads that nest the shared Detect branches (Pose/SegmentProto)
            candidates.append((layer, "detect") + path_mid + (leaf_name,))
        placed = False
        for cand in candidates:
            tgt = _get(new_vars[coll], cand)
            if tgt is not None and tuple(tgt.shape) == tuple(new_arr.shape):
                _set(new_vars[coll], cand, new_arr.astype(np.asarray(tgt).dtype))
                touched.add((coll,) + cand)
                converted.append(key)
                placed = True
                break
        if not placed:
            missed.append(key)

    # target leaves never written (random init kept)
    unmatched = []

    def scan(tree, coll, path=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                scan(v, coll, path + (k,))
            elif (coll,) + path + (k,) not in touched:
                unmatched.append("/".join((coll,) + path + (k,)))

    scan(new_vars["params"], "params")
    scan(new_vars["batch_stats"], "batch_stats")

    report = {
        "converted": len(converted),
        "skipped": skipped,
        "missed": missed,
        "unmatched_target": unmatched,
    }
    if missed:
        msg = f"{len(missed)} torch tensors found no home, e.g. {missed[:5]}"
        if strict:
            raise ValueError(msg)
        LOGGER.warning(msg)
    return new_vars, report


# ---------------------------------------------------------------------------
# SAM checkpoints (official segment-anything sam_vit_b/l/h state dicts;
# reference models/sam/build.py:133 loads them via attempt_download +
# load_state_dict — this is the torch-free equivalent for the flax SAM in
# models/sam/modules.py)
# ---------------------------------------------------------------------------

_SAM_SKIP = ()  # every official SAM tensor now has a flax counterpart


def _sam_ln(path, leaf, arr):
    return (path + ({"weight": "scale", "bias": "bias"}[leaf],), arr)


def _sam_dense(path, leaf, arr):
    return (path + ("kernel",), arr.T) if leaf == "weight" else (path + ("bias",), arr)


def _sam_map_key(key: str, arr: np.ndarray):
    """One official-SAM tensor name -> (section, flax path, array) or None
    (skip). Raises KeyError for unrecognized names so callers can report."""
    toks = key.split(".")
    sec, rest = toks[0], toks[1:]

    if sec == "image_encoder":
        if rest == ["pos_embed"]:
            return "encoder", ("pos_embed",), arr  # stored (1, h, w, C) already
        if rest[:2] == ["patch_embed", "proj"]:
            if rest[2] == "weight":
                return "encoder", ("patch_embed", "kernel"), arr.transpose(2, 3, 1, 0)
            return "encoder", ("patch_embed", "bias"), arr
        if rest[0] == "blocks":
            base, sub, leaf = (f"block{rest[1]}",), rest[2:-1], rest[-1]
            if sub[0] in ("norm1", "norm2"):
                return ("encoder",) + _sam_ln(base + (sub[0],), leaf, arr)
            if sub == ["attn"] and leaf in ("rel_pos_h", "rel_pos_w"):
                return "encoder", base + ("attn", leaf), arr
            if sub == ["attn", "qkv"] or sub == ["attn", "proj"]:
                return ("encoder",) + _sam_dense(base + tuple(sub), leaf, arr)
            if sub[0] == "mlp":
                return ("encoder",) + _sam_dense(base + ("mlp", sub[1]), leaf, arr)
        if rest[0] == "neck":
            idx, leaf = rest[1], rest[2]
            if idx in ("0", "2"):  # 1x1 / 3x3 convs, bias-free
                name = "neck0" if idx == "0" else "neck1"
                return "encoder", (name, "kernel"), arr.transpose(2, 3, 1, 0)
            name = "neck_ln0" if idx == "1" else "neck_ln1"  # LayerNorm2d
            return ("encoder",) + _sam_ln((name,), leaf, arr)

    if sec == "prompt_encoder":
        if rest[0] == "pe_layer":
            return "prompt", ("pe_layer", "positional_encoding_gaussian_matrix"), arr
        if rest[0] == "point_embeddings":
            return "prompt", (f"point_embed{rest[1]}",), arr
        if rest[0] == "not_a_point_embed":
            return "prompt", ("not_a_point_embed",), arr
        if rest[0] == "no_mask_embed":
            return "prompt", ("no_mask_embed",), arr
        if rest[0] == "mask_downscaling":
            # Sequential indices (reference encoders.py:151): 0/3/6 convs,
            # 1/4 LayerNorm2d (channel-last LN here, same math in NHWC)
            idx, leaf = rest[1], rest[2]
            conv = {"0": "mask_down0", "3": "mask_down1", "6": "mask_down2"}
            if idx in conv:
                if leaf == "weight":  # OIHW -> HWIO
                    return "prompt", (conv[idx], "kernel"), arr.transpose(2, 3, 1, 0)
                return "prompt", (conv[idx], "bias"), arr
            name = "mask_ln0" if idx == "1" else "mask_ln1"
            return ("prompt",) + _sam_ln((name,), leaf, arr)

    if sec == "mask_decoder":
        if rest[0] in ("iou_token", "mask_tokens"):
            return "decoder", (rest[0],), arr
        if rest[0] == "transformer":
            if rest[1] == "layers":
                base, sub, leaf = (f"layer{rest[2]}",), rest[3:-1], rest[-1]
            elif rest[1] == "final_attn_token_to_image":
                base, sub, leaf = ("final_attn",), rest[2:-1], rest[-1]
            elif rest[1] == "norm_final_attn":
                return ("decoder",) + _sam_ln(("transformer", "norm_final"), rest[-1], arr)
            else:
                raise KeyError(key)
            if sub and sub[0].startswith("norm"):
                return ("decoder",) + _sam_ln(("transformer",) + base + (sub[0],), leaf, arr)
            if sub and sub[0] == "mlp":
                return ("decoder",) + _sam_dense(
                    ("transformer",) + base + ("mlp", sub[1]), leaf, arr)
            # attention q/k/v/out projections (DownsampleAttention Dense)
            return ("decoder",) + _sam_dense(("transformer",) + base + tuple(sub), leaf, arr)
        if rest[0] == "output_upscaling":
            idx, leaf = rest[1], rest[2]
            if idx in ("0", "3"):
                name = "upscale0" if idx == "0" else "upscale1"
                if leaf == "weight":
                    # ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in,
                    # out) WITH a spatial flip: torch scatters the kernel
                    # as-is while lax.conv_transpose correlates, so the taps
                    # are mirrored (verified exact in test_sam_convert)
                    return "decoder", (name, "kernel"), np.ascontiguousarray(
                        arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
                return "decoder", (name, "bias"), arr
            return ("decoder",) + _sam_ln(("upscale_ln",), leaf, arr)
        if rest[0] == "output_hypernetworks_mlps":
            return ("decoder",) + _sam_dense(
                (f"hyper{rest[1]}", f"layers{rest[3]}"), rest[-1], arr)
        if rest[0] == "iou_prediction_head":
            return ("decoder",) + _sam_dense(
                ("iou_head", f"layers{rest[2]}"), rest[-1], arr)

    raise KeyError(key)


def _sam_map_key_tiny(key: str, arr: np.ndarray):
    """MobileSAM TinyViT encoder tensor name (tiny_encoder.py state dict) ->
    (collection, flax path, array), or None to skip (classifier head,
    num_batches_tracked). Raises KeyError for non-TinyViT names so the
    caller falls through to the ViT mapper (neck keys are shared)."""
    toks = key.split(".")
    if toks[0] != "image_encoder":
        raise KeyError(key)
    rest = toks[1:]
    if rest[0] in ("norm_head", "head"):
        return None  # ImageNet classifier head — absent from the SAM graph
    if rest[-1] == "num_batches_tracked":
        return None

    def convbn(base, mod, cb, leaf):
        if cb == "c" and leaf == "weight":
            return "params", base + (mod, "c", "kernel"), arr.transpose(2, 3, 1, 0)
        if cb == "bn":
            coll, l = {
                "weight": ("params", "scale"), "bias": ("params", "bias"),
                "running_mean": ("batch_stats", "mean"),
                "running_var": ("batch_stats", "var"),
            }[leaf]
            return coll, base + (mod, "bn", l), arr
        raise KeyError(key)

    if rest[0] == "patch_embed" and rest[1] == "seq":
        return convbn(("patch_embed",), f"seq{rest[2]}", rest[3], rest[4])
    if rest[0] == "layers":
        base = (f"layer{rest[1]}",)
        sub = rest[2:]
        if sub[0] == "blocks":
            base = base + (f"block{sub[1]}",)
            inner, leaf = sub[2:-1], sub[-1]
            if inner and inner[0] in ("conv1", "conv2", "conv3", "local_conv"):
                return convbn(base, inner[0], inner[1], leaf)
            if inner == ["attn", "norm"]:
                return ("params",) + _sam_ln(base + ("attn", "norm"), leaf, arr)
            if inner == ["attn"] and leaf == "attention_biases":
                return "params", base + ("attn", "attention_biases"), arr
            if inner and inner[0] == "attn" and inner[1] in ("qkv", "proj"):
                return ("params",) + _sam_dense(base + ("attn", inner[1]), leaf, arr)
            if inner == ["mlp", "norm"]:
                return ("params",) + _sam_ln(base + ("mlp_norm",), leaf, arr)
            if inner and inner[0] == "mlp" and inner[1] in ("fc1", "fc2"):
                return ("params",) + _sam_dense(base + (f"mlp_{inner[1]}",), leaf, arr)
            raise KeyError(key)
        if sub[0] == "downsample":
            return convbn(base + ("downsample",), sub[1], sub[2], sub[3])
    raise KeyError(key)


def convert_sam_state_dict(
    state: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    strict: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map an official SAM state dict onto ``Sam.init()`` variables
    ({'encoder'|'prompt'|'decoder': {'params': ...}}). strict=True raises on
    any unrecognized/unplaceable tensor or shape mismatch (pretrained weights
    must land whole — a silently partial SAM produces garbage masks)."""
    import copy

    from flax.core import unfreeze  # no-op on plain dicts

    new_vars = copy.deepcopy({k: unfreeze(v) for k, v in variables.items()})
    converted, skipped, missed = [], [], []
    touched = set()
    for key, arr in state.items():
        if key.startswith(_SAM_SKIP):
            skipped.append(key)
            continue
        try:
            mapped = _sam_map_key_tiny(key, np.asarray(arr))
            if mapped is None:
                skipped.append(key)
                continue
            sec, (coll, path, new_arr) = "encoder", mapped
        except KeyError:
            try:
                sec, path, new_arr = _sam_map_key(key, np.asarray(arr))
                coll = "params"
            except KeyError:
                missed.append(f"{key} (unrecognized)")
                continue
        full = (coll,) + path
        tgt = _get(new_vars[sec], full)
        # works on real arrays AND jax.ShapeDtypeStruct trees (eval_shape)
        tgt_shape = getattr(tgt, "shape", None) if tgt is not None else None
        if tgt is None or tuple(tgt_shape) != tuple(new_arr.shape):
            missed.append(
                f"{key} -> {sec}/{'/'.join(path)} "
                f"(target {'missing' if tgt is None else tgt_shape}, src {new_arr.shape})"
            )
            continue
        _set(new_vars[sec], full, new_arr.astype(getattr(tgt, "dtype", new_arr.dtype)))
        touched.add((sec,) + full)
        converted.append(key)

    unmatched = []

    def scan(tree, pre):
        for k, v in tree.items():
            if isinstance(v, dict):
                scan(v, pre + (k,))
            elif pre + (k,) not in touched:
                unmatched.append("/".join(pre + (k,)))

    for sec in new_vars:
        scan(new_vars[sec], (sec,))

    report = {
        "converted": len(converted),
        "skipped": skipped,
        "missed": missed,
        "unmatched_target": unmatched,
    }
    if (missed or unmatched) and strict:
        raise ValueError(
            f"SAM conversion incomplete: {len(missed)} source tensors missed "
            f"(e.g. {missed[:3]}), {len(unmatched)} target leaves unfilled "
            f"(e.g. {unmatched[:3]})"
        )
    if missed or unmatched:
        LOGGER.warning(
            f"SAM conversion partial: {len(missed)} missed, {len(unmatched)} unfilled"
        )
    return new_vars, report


def convert_torch_checkpoint(
    pt_path,
    model_yaml,
    out_path: Optional[str] = None,
    nc: Optional[int] = None,
    imgsz: int = 640,
    strict: bool = False,
):
    """End-to-end migration: reference .pt -> native .ckpt loadable by
    ``YOLO(out_path)``. Builds the model from ``model_yaml`` (must match the
    .pt architecture), initializes, overwrites with converted weights."""
    from ..nn.tasks import build_model
    from .checkpoint import save_checkpoint

    ckpt = load_torch_checkpoint(pt_path)
    state = extract_state_dict(ckpt)
    tgt_nc = nc
    model = build_model(model_yaml, nc=tgt_nc)
    variables = model.init(imgsz=imgsz)
    new_vars, report = convert_state_dict(state, variables, strict=strict)
    LOGGER.info(
        f"converted {report['converted']} tensors from {pt_path}; "
        f"{len(report['missed'])} missed, "
        f"{len(report['unmatched_target'])} target leaves kept random"
    )
    train_args = ckpt.get("train_args") or {}
    if not isinstance(train_args, dict):
        train_args = {}
    out = Path(out_path or Path(pt_path).with_suffix(".ckpt"))
    save_checkpoint(
        out,
        params=new_vars["params"],
        batch_stats=new_vars["batch_stats"],
        ema_params=None,
        opt_state=None,
        step=0,
        epoch=int(ckpt.get("epoch", -1) or -1),
        best_fitness=float(ckpt.get("best_fitness") or 0.0),
        train_args={k: v for k, v in train_args.items() if isinstance(v, (int, float, str, bool))},
        model_yaml=model.yaml,
        names=getattr(model, "names", {}),
    )
    return str(out), report
