"""YAML graph builder + task models.

TPU-native re-implementation of ``ultralytics/nn/tasks.py``: ``parse_model``
(tasks.py:660-742) becomes a pure spec compiler (yaml dict -> static layer
specs), and the wired network is a single flax.linen module (``GraphModel``)
whose forward is one traced, fusable XLA graph — no nn.Sequential, no dynamic
`from`-index dispatch at runtime.

Scaling semantics preserved exactly: depth gain ``n = max(round(n*depth), 1)``,
width gain ``c2 = make_divisible(min(c2, max_ch) * width, 8)`` skipping the
nc-passthrough case, scale letters n/s/m/l/x from the yaml `scales` block, and
stride calibration by a 256px dummy forward (tasks.py:244-256) done here with
``jax.eval_shape`` so no FLOPs are spent.
"""
from __future__ import annotations

import math
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import yaml
from flax import linen as nn
from flax.core import FrozenDict

from .modules import block as block_mod
from .modules import conv as conv_mod
from .modules import head as head_mod

# ---------------------------------------------------------------------------
# Module registry: yaml name -> (flax class, positional field names, kind)
# kind: 'conv' width-scaled c2; 'csp' width-scaled c2 + repeats; 'hg' HGBlock
# family; 'concat'; 'upsample'; 'head'; 'classify_head'
# ---------------------------------------------------------------------------
REGISTRY: Dict[str, Tuple[Any, Tuple[str, ...], str]] = {
    "Conv": (conv_mod.Conv, ("c2", "k", "s", "p", "g", "d", "act"), "conv"),
    "Conv2": (conv_mod.Conv2, ("c2", "k", "s", "p", "g", "d", "act"), "conv"),
    "DWConv": (conv_mod.DWConv, ("c2", "k", "s", "d", "act"), "conv"),
    "ConvTranspose": (conv_mod.ConvTranspose, ("c2", "k", "s", "p", "bn", "act"), "conv"),
    # reference yamls name the raw torch layer (v6 neck); bn=False matches
    # nn.ConvTranspose2d (no norm, no act)
    "nn.ConvTranspose2d": (conv_mod.ConvTranspose, ("c2", "k", "s", "p"), "conv"),
    "Focus": (conv_mod.Focus, ("c2", "k", "s", "p", "act"), "conv"),
    "GhostConv": (conv_mod.GhostConv, ("c2", "k", "s", "g", "act"), "conv"),
    "RepConv": (conv_mod.RepConv, ("c2", "k", "s", "g", "d", "act"), "conv"),
    "LightConv": (conv_mod.LightConv, ("c2", "k", "act"), "conv"),
    "CBAM": (conv_mod.CBAM, ("k",), "same_ch"),
    "Bottleneck": (block_mod.Bottleneck, ("c2", "shortcut", "g", "k", "e"), "conv"),
    "GhostBottleneck": (block_mod.GhostBottleneck, ("c2", "k", "s"), "conv"),
    "SPP": (block_mod.SPP, ("c2", "k"), "conv"),
    "SPPF": (block_mod.SPPF, ("c2", "k"), "conv"),
    "C1": (block_mod.C1, ("c2", "n"), "csp"),
    "C2": (block_mod.C2, ("c2", "n", "shortcut", "g", "e"), "csp"),
    "C2f": (block_mod.C2f, ("c2", "n", "shortcut", "g", "e"), "csp"),
    "C3": (block_mod.C3, ("c2", "n", "shortcut", "g", "e"), "csp"),
    "C3x": (block_mod.C3x, ("c2", "n", "shortcut", "g", "e"), "csp"),
    "C3Ghost": (block_mod.C3Ghost, ("c2", "n", "shortcut", "g", "e"), "csp"),
    "RepC3": (block_mod.RepC3, ("c2", "n", "e"), "csp"),
    "NASCSP": (block_mod.NASCSP, ("c2", "n", "shortcut", "e"), "csp"),
    "RepBlock": (block_mod.RepBlock, ("c2", "n", "shortcut"), "csp"),
    "HGStem": (block_mod.HGStem, ("cm", "c2"), "hg"),
    "HGBlock": (block_mod.HGBlock, ("cm", "c2", "k", "n", "lightconv", "shortcut", "act"), "hg"),
    "Concat": (conv_mod.Concat, ("axis",), "concat"),
    "nn.Upsample": (None, (), "upsample"),
    "AIFI": (None, ("cm", "num_heads"), "aifi"),  # class bound lazily (circular import)
    "TransformerBlock": (None, ("c2", "num_heads", "num_layers"), "transformer_block"),
    "RTDETRDecoder": (None, ("nc",), "head"),
    # Heads. 'Segment' is the polar head — the canonical trained config
    # (SURVEY.md §0.1); the stock proto-mask head is 'Segmentori'.
    "Segment": (head_mod.PolarSegment, ("nc", "nm", "npr"), "head"),
    "Segmentori": (head_mod.SegmentProto, ("nc", "nm", "npr"), "head"),
    "Detect": (head_mod.Detect, ("nc",), "head"),
    "Pose": (head_mod.Pose, ("nc", "kpt_shape"), "head"),
    "Classify": (head_mod.Classify, ("nc",), "classify_head"),
}

HEAD_TASKS = {
    "Segment": "segment",
    "Segmentori": "segment_ori",
    "Detect": "detect",
    "Pose": "pose",
    "Classify": "classify",
    "RTDETRDecoder": "rtdetr",
}


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


class LayerSpec:
    """Static description of one graph layer (hashable, jit-safe)."""

    __slots__ = ("i", "f", "name", "kwargs", "kind", "c2")

    def __init__(self, i, f, name, kwargs, kind, c2):
        self.i, self.f, self.name, self.kwargs, self.kind, self.c2 = (
            i, f, name, kwargs, kind, c2,
        )

    def key(self):
        return (self.i, tuple(self.f) if isinstance(self.f, list) else self.f,
                self.name, tuple(sorted(self.kwargs.items(), key=lambda kv: kv[0])),
                self.kind, self.c2)

    def __repr__(self):
        return f"LayerSpec({self.i}, f={self.f}, {self.name}, {self.kwargs})"


def parse_model(cfg: dict, ch: int = 3, verbose: bool = False):
    """yaml dict -> (specs, savelist, head_spec). Mirrors reference
    tasks.py:660 scaling rules; produces static descriptors, not modules."""
    nc = cfg.get("nc", 80)
    act = cfg.get("activation")
    scales = cfg.get("scales")
    depth = cfg.get("depth_multiple", 1.0)
    width = cfg.get("width_multiple", 1.0)
    kpt_shape = cfg.get("kpt_shape", (17, 3))
    max_channels = float("inf")
    if scales:
        scale = cfg.get("scale") or tuple(scales.keys())[0]
        depth, width, max_channels = scales[scale]

    chs: List[int] = [ch]
    specs: List[LayerSpec] = []
    save: List[int] = []
    head_spec: Optional[LayerSpec] = None

    for i, (f, n, name, args) in enumerate(list(cfg["backbone"]) + list(cfg["head"])):
        args = list(args)
        # normalize negative from-indices (-2 etc.) to absolute layer ids,
        # keeping -1 = previous output (reference keeps them relative and
        # indexes a full outputs list; we only keep saved outputs)
        if isinstance(f, int):
            f = f if f == -1 else f % i
        else:
            f = [x if x == -1 else x % i for x in f]
        for j, a in enumerate(args):
            if isinstance(a, str):
                if a == "nc":
                    args[j] = nc
                elif a == "kpt_shape":
                    args[j] = kpt_shape
                elif a in ("True", "False", "None"):
                    args[j] = {"True": True, "False": False, "None": None}[a]
        if name not in REGISTRY:
            raise KeyError(f"unknown module '{name}' in model yaml")
        cls, fields, kind = REGISTRY[name]
        n = max(round(n * depth), 1) if n > 1 else n

        kwargs: Dict[str, Any] = {}
        if kind in ("conv", "csp"):
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            vals = [c2] + args[1:]
            if kind == "csp":
                vals = [c2, n] + args[1:]
                n = 1
            for fname, v in zip(fields, vals):
                kwargs[fname] = v
        elif kind == "hg":
            cm, c2 = args[0], args[1]
            vals = [cm, c2] + args[2:]
            if name == "HGBlock":
                vals = [cm, c2] + args[2:3] + [n] + args[3:]
                n = 1
            for fname, v in zip(fields, vals):
                kwargs[fname] = v
        elif kind == "concat":
            c2 = sum(chs[x] for x in f)
            kwargs["axis"] = -1  # NHWC: yaml says dim 1 (NCHW); ours is channels-last
        elif kind == "upsample":
            c2 = chs[f]
            kwargs["scale"] = args[1] if len(args) > 1 else 2
            kwargs["mode"] = args[2] if len(args) > 2 else "nearest"
        elif kind == "aifi":
            c2 = chs[f]
            for fname, v in zip(fields, args):
                kwargs[fname] = v
        elif kind == "transformer_block":
            c2 = make_divisible(min(args[0], max_channels) * width, 8)
            vals = [c2] + args[1:2] + [n]
            n = 1
            for fname, v in zip(fields, vals):
                kwargs[fname] = v
        elif kind in ("head", "classify_head"):
            for fname, v in zip(fields, args):
                kwargs[fname] = v
            if name == "Segment" and len(args) > 2:
                kwargs["npr"] = make_divisible(min(args[2], max_channels) * width, 8)
            c2 = nc
        else:  # same_ch
            c2 = chs[f]
            for fname, v in zip(fields, args):
                kwargs[fname] = v

        if kind in ("conv", "csp", "hg") and n > 1:
            kwargs["_repeats"] = n

        spec = LayerSpec(i, f, name, kwargs, kind, c2)
        specs.append(spec)
        if kind in ("head", "classify_head"):
            head_spec = spec
        save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            chs = []
        chs.append(c2)

    return specs, sorted(set(save)), head_spec


def _build_module(spec: LayerSpec, dtype, name: str):
    cls, fields, kind = REGISTRY[spec.name]
    kwargs = {k: v for k, v in spec.kwargs.items() if not k.startswith("_")}
    if kind == "upsample":
        return None
    if cls is None:  # lazily-bound transformer classes (circular import)
        from .modules import head as _head
        from .modules import transformer as _tr

        cls = {"AIFI": _tr.AIFI, "TransformerBlock": _tr.TransformerBlock,
               "RTDETRDecoder": _head.RTDETRDecoder}[spec.name]
    if "dtype" in cls.__dataclass_fields__:
        kwargs["dtype"] = dtype
    if spec.name == "Pose" and "kpt_shape" in kwargs:
        kwargs["kpt_shape"] = tuple(kwargs["kpt_shape"])
    if spec.name == "nn.ConvTranspose2d":  # raw torch layer: no BN, no act
        kwargs.setdefault("bn", False)
        kwargs.setdefault("act", False)
    return cls(name=name, **kwargs)


def _upsample(x, scale=2, mode="nearest"):
    b, h, w, c = x.shape
    if mode == "nearest":
        x = x[:, :, None, :, None, :]
        x = jnp.broadcast_to(x, (b, h, scale, w, scale, c))
        return x.reshape(b, h * scale, w * scale, c)
    return jax.image.resize(x, (b, h * scale, w * scale, c), method=mode)


class GraphModel(nn.Module):
    """The wired network: backbone + neck + head as one linen module.

    `spec_cfg` is the raw yaml dict (static); layers are rebuilt in compact
    form each trace — XLA sees a single flat graph.
    """

    cfg: FrozenDict  # model yaml as a frozen (hashable) dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, head_extra=None, capture: bool = False):
        specs, save, head_spec = parse_model(unfreeze_cfg(self.cfg), ch=x.shape[-1])
        y: Dict[int, Any] = {}
        out = x
        for spec in specs:
            if isinstance(spec.f, int):
                inp = out if spec.f == -1 else y[spec.f]
            else:
                inp = [out if j == -1 else y[j] for j in spec.f]
            if spec.kind == "upsample":
                out = _upsample(inp, spec.kwargs["scale"], spec.kwargs["mode"])
            elif spec.kind == "concat":
                out = jnp.concatenate(list(inp), axis=-1)
            else:
                reps = spec.kwargs.get("_repeats", 1)
                for r in range(reps):
                    mod = _build_module(spec, self.dtype, name=f"layer{spec.i}" + (f"_{r}" if reps > 1 else ""))
                    if head_extra is not None and spec is head_spec:
                        # extra head-only input (RT-DETR denoising groups)
                        out = mod(inp if r == 0 else out, train=train, dn=head_extra)
                    else:
                        out = mod(inp if r == 0 else out, train=train)
                    inp = out
            if spec.i in save:
                y[spec.i] = out
            if capture and spec is not head_spec and hasattr(out, "shape"):
                # per-layer feature maps for predictor visualize=True
                # (reference plotting.py:573 feature_visualization hook)
                self.sow("intermediates", f"layer{spec.i}_{spec.name}", out)
        return out  # head output


def unfreeze_cfg(cfg):
    """FrozenDict/tuple-ified yaml -> plain dict/lists."""
    if isinstance(cfg, (FrozenDict, dict)):
        return {k: unfreeze_cfg(v) for k, v in cfg.items()}
    if isinstance(cfg, (tuple, list)):
        return [unfreeze_cfg(v) for v in cfg]
    return cfg


def freeze_cfg(cfg):
    if isinstance(cfg, dict):
        return FrozenDict({k: freeze_cfg(v) for k, v in cfg.items()})
    if isinstance(cfg, (list, tuple)):
        return tuple(freeze_cfg(v) for v in cfg)
    return cfg


def yaml_model_load(path) -> dict:
    """Load a model yaml, extracting the scale letter from names like
    'yolov8n-seg.yaml' -> base 'yolov8-seg.yaml' + scale 'n'
    (reference tasks.py:745-778)."""
    path = Path(path)
    stem = path.stem
    m = re.match(r"(.*yolov\d+)([nslmx])([-_].+)?$", stem) or re.match(
        r"(.*yolov\d+)([nslmx])$", stem
    )
    nas = re.match(r"(yolo_nas)_([sml])$", stem)
    scale = ""
    name = path
    if m:
        scale = m.group(2)
        base_stem = m.group(1) + (m.group(3) or "")
        name = path.with_name(base_stem + path.suffix)
    elif nas:  # yolo_nas_s -> yolo_nas.yaml scale s
        scale = nas.group(2)
        name = path.with_name(nas.group(1) + (path.suffix or ".yaml"))
    search = [name, path]
    from ..cfg import MODELS_DIR  # local import to avoid cycle

    for cand in list(search) + [MODELS_DIR / Path(n).name for n in search]:
        if Path(cand).exists():
            with open(cand) as fh:
                cfg = yaml.safe_load(fh)
            cfg["scale"] = scale or cfg.get("scale", "")
            cfg["yaml_file"] = str(cand)
            return cfg
    raise FileNotFoundError(f"model yaml not found: {path}")


def guess_model_task(cfg: dict) -> str:
    head_name = cfg["head"][-1][2]
    return HEAD_TASKS.get(head_name, "detect")


class BaseModel:
    """Functional task model: owns the yaml spec, linen module, and variables.

    Equivalent surface of reference nn/tasks.py BaseModel/DetectionModel — but
    parameters live in an explicit pytree (`variables`) and every compute path
    is a pure function, so the trainer can jit/pjit/vmap/grad them freely.
    """

    task = "detect"

    def __init__(self, cfg, nc: Optional[int] = None, dtype=jnp.float32, verbose: bool = False):
        if isinstance(cfg, (str, Path)):
            cfg = yaml_model_load(cfg)
        self.yaml = dict(cfg)
        if nc and nc != self.yaml.get("nc"):
            self.yaml["nc"] = nc
        self.nc = self.yaml["nc"]
        self.dtype = dtype
        self.module = GraphModel(cfg=freeze_cfg(self.yaml), dtype=dtype)
        self.specs, self.save, self.head_spec = parse_model(self.yaml)
        self.head_name = self.head_spec.name
        self.head_index = self.head_spec.i
        self.reg_max = 16
        self.nm = self.head_spec.kwargs.get("nm", 36)
        self.kpt_shape = tuple(self.head_spec.kwargs.get("kpt_shape", (17, 3)))
        self.strides = self._calibrate_strides()
        self.variables = None
        self.names = {i: f"class{i}" for i in range(self.nc)}

    # -- construction ------------------------------------------------------
    def _calibrate_strides(self, imgsz: int = 256) -> Tuple[int, ...]:
        """Stride calibration via abstract eval (no FLOPs): trace the graph on
        a 256px dummy and read per-level H (reference tasks.py:244-256)."""
        if self.head_spec.kind == "classify_head":
            return ()

        def fwd(x):
            outs = self.module.init_with_output(
                {"params": jax.random.PRNGKey(0)}, x, train=False
            )[0]
            if isinstance(outs, tuple):  # SegmentProto returns (levels, proto)
                outs = outs[0]
            return [o.shape for o in outs]

        shapes = jax.eval_shape(
            lambda x: self.module.init_with_output({"params": jax.random.PRNGKey(0)}, x)[0],
            jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), jnp.float32),
        )
        outs = shapes[0] if isinstance(shapes, tuple) and not hasattr(shapes, "shape") else shapes
        if isinstance(outs, (list, tuple)) and hasattr(outs[0], "shape"):
            return tuple(imgsz // o.shape[1] for o in outs)
        return (8, 16, 32)

    def _init_head_extra(self):
        """Extra head input needed at init so every train-time param exists
        (RT-DETR's denoising embed); None for anchor heads."""
        return None

    def init(self, rng=None, imgsz: int = 640):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        extra = self._init_head_extra()
        variables = self.module.init(
            {"params": rng}, jnp.zeros((1, imgsz, imgsz, 3), jnp.float32),
            train=extra is not None, head_extra=extra,
        )
        variables = jax.tree_util.tree_map(lambda x: x, variables)  # materialize
        if self.head_spec.kind == "head":
            params = variables["params"]
            head_params = dict(params[f"layer{self.head_index}"])
            polar = self.head_name == "Segment"
            for i, s in enumerate(self.strides):
                tgt = head_params if f"cv3_{i}_2" in head_params else dict(head_params.get("detect", {}))
                if f"cv3_{i}_2" in tgt:
                    b = dict(tgt[f"cv3_{i}_2"])
                    b["bias"] = jnp.full_like(
                        b["bias"], math.log(5 / self.nc / (640 / s) ** 2)
                    )
                    tgt[f"cv3_{i}_2"] = b
                if polar and f"cv2_{i}_2" in tgt:
                    b = dict(tgt[f"cv2_{i}_2"])
                    b["bias"] = jnp.ones_like(b["bias"])
                    tgt[f"cv2_{i}_2"] = b
                if tgt is not head_params:
                    head_params["detect"] = tgt
            params = dict(params)
            params[f"layer{self.head_index}"] = head_params
            variables = dict(variables)
            variables["params"] = params
        self.variables = variables
        return variables

    # -- pure forward fns (use under jit) ----------------------------------
    def raw_forward(self, variables, x, train: bool = False, head_extra=None):
        """x (B, H, W, 3) -> head raw output (+ new batch stats if train).
        ``head_extra`` reaches the head module only (RT-DETR dn groups)."""
        if train:
            out, mut = self.module.apply(
                variables, x, train=True, head_extra=head_extra,
                mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]
        return self.module.apply(variables, x, train=False)

    def predict(self, variables, x):
        """Eval forward + in-graph decode -> (B, C, A) prediction tensor."""
        outs = self.raw_forward(variables, x, train=False)
        return self.decode(outs)

    def forward_features(self, variables, x) -> Dict[str, Any]:
        """Per-layer feature maps {'layer{i}_{Name}': (B, H, W, C)} for
        feature visualization (reference predictor visualize=True ->
        plotting.py:573)."""
        _, inter = self.module.apply(
            variables, x, train=False, capture=True, mutable=["intermediates"]
        )
        # flax sow stores tuples; unwrap the single entry
        return {k: v[0] for k, v in inter["intermediates"].items()}

    def decode(self, outs):
        raise NotImplementedError

    @property
    def num_params(self) -> int:
        if self.variables is None:
            self.init()
        return sum(
            int(p.size) for p in jax.tree_util.tree_leaves(self.variables["params"])
        )


class SegmentationModel(BaseModel):
    """Polar-contour segmentation model (reference tasks.py:307 pairing the
    canonical polarpaper head, SURVEY.md §0.1)."""

    task = "segment"

    def decode(self, outs):
        return head_mod.decode_polar(outs, self.strides, self.nc, self.nm)

    def predict_lazy(self, variables, x):
        """Eval forward + lazy decode (B, 4+nc+38, A): contour points are
        reconstructed post-NMS via head.finalize_polar_extras — identical
        results to predict(), ~3x less pre-NMS HBM traffic (see
        decode_polar_lazy docstring). Used by predictor/validator/bench;
        export keeps the full predict() layout."""
        outs = self.raw_forward(variables, x, train=False)
        return head_mod.decode_polar_lazy(outs, self.strides, self.nc, self.nm)

    def predict_parts(self, variables, x, sigmoid: bool = True):
        """Eval forward + unconcatenated decode: (boxes (B, A, 4), scores
        (B, A, nc), extras (B, A, 38)) straight into
        ``ops.nms.non_max_suppression_parts`` — the deploy hot path, skipping
        the reference (B, C, A) layout round-trip entirely (see
        head.decode_polar_parts). predict() remains the export contract.

        ``sigmoid=False`` returns raw class logits — pair with
        ``non_max_suppression_parts(..., scores_are_logits=True)`` for the
        bit-identical-but-leaner normalize-after-reduce path."""
        outs = self.raw_forward(variables, x, train=False)
        return head_mod.decode_polar_parts(
            outs, self.strides, self.nc, self.nm, sigmoid=sigmoid
        )

    def predict_topk(self, variables, x, k: int = 1024, conf_thres=0.25):
        """Eval forward + filter-before-decode: top-``k`` candidates selected
        on raw class logits, boxes/extras decoded for those k anchors only
        (head.decode_polar_topk). Pair with
        ``ops.nms.non_max_suppression_selected`` — bit-identical to the
        predict_parts pipeline at the same pre_nms, with no full-anchor-set
        boxes/extras materialization. Best-class (predict-mode) semantics."""
        outs = self.raw_forward(variables, x, train=False)
        return head_mod.decode_polar_topk(
            outs, self.strides, self.nc, self.nm, k=k, conf_thres=conf_thres
        )


class DetectionModel(BaseModel):
    task = "detect"

    def decode(self, outs):
        return head_mod.decode_detect(outs, self.strides, self.nc, self.reg_max)

    def predict_augmented(self, variables, x):
        """Multi-scale + horizontal-flip TTA (reference nn/tasks.py
        DetectionModel._predict_augment + torch_utils.scale_img:318): three
        passes at scales (1, .83, .67), fliplr on the middle one; predictions
        de-scaled/de-flipped back to input space and concatenated along the
        anchor axis, with the reference's _clip_augmented tail/head anchor
        trim. Output layout matches predict(): (B, 4+nc, sum A_i), xywh
        boxes — detect-only, like the reference (other tasks warn and fall
        back to single-scale in the predictor)."""
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        gs = int(max(self.strides)) if self.strides else 32
        preds = []
        for si, fi in ((1.0, False), (0.83, True), (0.67, False)):
            xi = x[:, :, ::-1, :] if fi else x
            if si != 1.0:
                rh, rw = int(h * si), int(w * si)
                ph = math.ceil(h * si / gs) * gs
                pw = math.ceil(w * si / gs) * gs
                xi = jax.image.resize(xi, (b, rh, rw, x.shape[3]), "bilinear")
                xi = jnp.pad(
                    xi, ((0, 0), (0, ph - rh), (0, pw - rw), (0, 0)),
                    constant_values=0.447,  # reference scale_img pad value
                )
            yi = self.predict(variables, xi)  # (B, 4+nc, A_i) xywh centers
            box = yi[:, :4] / si
            if fi:  # un-flip: cx' = w - cx (xywh layout)
                box = jnp.concatenate([w - box[:, 0:1], box[:, 1:]], axis=1)
            preds.append(jnp.concatenate([box, yi[:, 4:]], axis=1))
        # reference _clip_augmented (e=1): drop the largest-stride level of
        # the full-scale pass and the smallest-stride level of the smallest
        nl = len(self.strides) or 3
        g = sum(4 ** i for i in range(nl))
        tail = preds[0].shape[-1] // g
        preds[0] = preds[0][..., : preds[0].shape[-1] - tail]
        head = (preds[-1].shape[-1] // g) * 4 ** (nl - 1)
        preds[-1] = preds[-1][..., head:]
        return jnp.concatenate(preds, axis=-1)


class SegmentationOriModel(BaseModel):
    """Stock prototype-mask segmentation (the reference's parallel
    'segment_ori' task, models/yolo/segment_ori/)."""

    task = "segment_ori"

    def decode(self, outs):
        levels, proto = outs
        nm = self.head_spec.kwargs.get("nm", 32)
        det = [o[..., : o.shape[-1] - nm] for o in levels]
        mc = head_mod.flatten_levels([o[..., -nm:] for o in levels])
        y = head_mod.decode_detect(det, self.strides, self.nc, self.reg_max)
        return jnp.concatenate([y, jnp.transpose(mc, (0, 2, 1))], axis=1), proto


class PoseModel(BaseModel):
    task = "pose"

    def decode(self, outs):
        feat_hw = [(o.shape[1], o.shape[2]) for o in outs]
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        det = [o[..., :-nk] for o in outs]
        kpt = head_mod.flatten_levels([o[..., -nk:] for o in outs])
        y = head_mod.decode_detect(det, self.strides, self.nc, self.reg_max)
        k = head_mod.decode_pose(kpt, self.strides, feat_hw, self.kpt_shape)
        b = y.shape[0]
        return jnp.concatenate([y, jnp.transpose(k.reshape(b, -1, nk), (0, 2, 1))], axis=1)


class ClassificationModel(BaseModel):
    task = "classify"

    def decode(self, outs):
        return outs  # already (B, nc) sigmoid probs


class RTDETRDetectionModel(BaseModel):
    """RT-DETR model (reference nn/tasks.py:414 RTDETRDetectionModel): eval
    head output is already decoded (B, nq, 4+nc) normalized cxcywh + sigmoid
    scores — no anchors, no NMS."""

    task = "rtdetr"

    def _calibrate_strides(self, imgsz: int = 256):
        return (8, 16, 32)  # decoder head; strides only used for logging

    def _init_head_extra(self):
        # minimal dn group so denoising_class_embed exists in the param tree
        return {
            "labels": jnp.zeros((1, 1, 2, 1), jnp.int32),
            "boxes_logit": jnp.zeros((1, 1, 2, 1, 4), jnp.float32),
        }

    def decode(self, outs):
        return outs  # (B, nq, 4+nc)


TASK_MODELS = {
    "segment": SegmentationModel,
    "segment_ori": SegmentationOriModel,
    "detect": DetectionModel,
    "pose": PoseModel,
    "classify": ClassificationModel,
    "rtdetr": RTDETRDetectionModel,
}


def build_model(cfg, task: Optional[str] = None, nc=None, dtype=jnp.float32) -> BaseModel:
    if isinstance(cfg, (str, Path)):
        cfg = yaml_model_load(cfg)
    task = task or guess_model_task(cfg)
    cls = TASK_MODELS.get(task, DetectionModel)
    return cls(cfg, nc=nc, dtype=dtype)
