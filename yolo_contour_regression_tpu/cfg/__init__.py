"""Config system: layered defaults -> overrides -> CLI k=v args.

Re-implements the reference's cfg layer (``ultralytics/cfg/__init__.py``):
``get_cfg`` (cfg/__init__.py:97) merge + type-check, ``entrypoint``
(cfg/__init__.py:295) CLI parsing with TASKS x MODES validation, and
deprecation shims — torch-free.
"""
from __future__ import annotations

import argparse
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, Optional, Union

import yaml

CFG_DIR = Path(__file__).parent
MODELS_DIR = CFG_DIR / "models"
DATASETS_DIR = CFG_DIR / "datasets"
DEFAULT_CFG_PATH = CFG_DIR / "default.yaml"

TASKS = ("detect", "segment", "segment_ori", "classify", "pose")
MODES = ("train", "val", "predict", "export", "track", "benchmark", "serve")

TASK2MODEL = {
    "detect": "yolov8n.yaml",
    "segment": "yolov8n-seg.yaml",
    "segment_ori": "yolov8-segori.yaml",
    "classify": "yolov8n-cls.yaml",
    "pose": "yolov8n-pose.yaml",
}
TASK2DATA = {
    "detect": "coco8.yaml",
    "segment": "coco8-seg.yaml",
    "segment_ori": "coco8-seg.yaml",
    "classify": "imagenet10",
    "pose": "coco8-pose.yaml",
}

# keys that must be float in (0,1) / int / bool — mirrored from the reference's
# CFG_FLOAT_KEYS / CFG_FRACTION_KEYS / CFG_INT_KEYS / CFG_BOOL_KEYS checks
CFG_FRACTION_KEYS = {
    "dropout", "iou", "lr0", "lrf", "momentum", "weight_decay", "warmup_momentum",
    "warmup_bias_lr", "label_smoothing", "hsv_h", "hsv_s", "hsv_v", "translate",
    "scale", "perspective", "flipud", "fliplr", "mosaic", "mosaic9", "mixup", "copy_paste",
    "conf", "fraction",
}
CFG_INT_KEYS = {
    "epochs", "patience", "workers", "seed", "close_mosaic", "mask_ratio",
    "val_mask_ratio",
    "max_det", "vid_stride", "workspace", "nbs", "save_period", "max_instances",
    "cand_per_gt", "pre_nms", "save_last_every",
}
CFG_BOOL_KEYS = {
    "save", "exist_ok", "verbose", "deterministic", "single_cls", "rect",
    "cos_lr", "resume", "amp", "profile", "overlap_mask", "val", "save_json",
    "save_hybrid", "half", "dnn", "plots", "show", "save_txt", "save_conf",
    "save_crop", "show_labels", "show_conf", "visualize", "augment",
    "agnostic_nms", "retina_masks", "boxes", "keras", "optimize", "int8",
    "dynamic", "simplify", "nms", "pretrained", "donate",
}

_DEPRECATED = {"boxes": "boxes", "hide_labels": "show_labels", "hide_conf": "show_conf"}


def yaml_load(path) -> Dict[str, Any]:
    with open(path) as fh:
        return yaml.safe_load(fh) or {}


def yaml_save(path, data: Dict[str, Any]):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        yaml.safe_dump({k: (str(v) if isinstance(v, Path) else v) for k, v in data.items()}, fh, sort_keys=False)


DEFAULT_CFG_DICT = yaml_load(DEFAULT_CFG_PATH)
DEFAULT_CFG = SimpleNamespace(**DEFAULT_CFG_DICT)


def _coerce(k: str, v: Any) -> Any:
    if v is None or isinstance(v, (dict, list)):
        return v
    if k in CFG_BOOL_KEYS and isinstance(v, str):
        if k in ("resume", "pretrained") and v.lower() not in ("0", "1", "true", "false", "yes", "no"):
            return v  # these accept a checkpoint path as well as a bool
        return v.lower() in ("1", "true", "yes")
    if k in CFG_INT_KEYS and isinstance(v, (str, float)):
        if k == "cand_per_gt" and isinstance(v, str) and v.lower() == "auto":
            return v  # imgsz-adaptive assigner cap (tal.resolve_cand)
        return int(float(v))
    if k in CFG_FRACTION_KEYS and isinstance(v, str):
        return float(v)
    return v


def check_cfg(cfg: Dict[str, Any]):
    for k in CFG_FRACTION_KEYS:
        v = cfg.get(k)
        if isinstance(v, (int, float)) and not (0.0 <= float(v) <= 1.0) and k not in ("lr0", "weight_decay"):
            if k in ("conf", "iou", "fraction", "mosaic", "mixup", "dropout"):
                raise ValueError(f"'{k}={v}' must be in [0, 1]")
    return cfg


def get_cfg(
    cfg: Union[str, Path, Dict, SimpleNamespace] = DEFAULT_CFG_DICT,
    overrides: Optional[Dict] = None,
) -> SimpleNamespace:
    """Merge config sources (reference cfg/__init__.py:97 get_cfg)."""
    if isinstance(cfg, (str, Path)):
        cfg = yaml_load(cfg)
    elif isinstance(cfg, SimpleNamespace):
        cfg = vars(cfg)
    cfg = {**DEFAULT_CFG_DICT, **cfg}
    if overrides:
        overrides = {_DEPRECATED.get(k, k): v for k, v in overrides.items()}
        cfg = {**cfg, **overrides}
    cfg = {k: _coerce(k, v) for k, v in cfg.items()}
    check_cfg(cfg)
    return SimpleNamespace(**cfg)


def parse_key_value_args(args) -> Dict[str, Any]:
    """['k=v', ...] -> dict with yaml-typed values (reference merge_equals_args)."""
    out = {}
    for a in args:
        if "=" not in a:
            continue
        k, v = a.split("=", 1)
        try:
            v = yaml.safe_load(v)
        except yaml.YAMLError:
            pass
        out[k.strip()] = v
    return out


def entrypoint(argv=None):
    """CLI: ``yolo TASK MODE k=v ...`` (reference cfg/__init__.py:295)."""
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(
            "usage: yolo TASK MODE [k=v ...]\n"
            f"  TASK in {TASKS}\n  MODE in {MODES}\n"
            "example: yolo segment train model=yolov8n-seg.yaml data=coco8-seg.yaml epochs=1\n"
            "special: yolo checks | version | settings [reset] | cfg | "
            "copy-cfg | hub login KEY | hub logout"
        )
        return 0

    # special commands (reference cfg/__init__.py:315 `special` dict),
    # accepting the reference's lenient spellings (-version, --settings, ...)
    head = argv[0].lower().lstrip("-")
    if head in ("check", "checks"):
        from ..utils.checks import check_yolo

        check_yolo()
        return 0
    if head == "version":
        from .. import __version__

        print(__version__)
        return 0
    if head in ("setting", "settings"):
        from ..utils.settings import get_settings

        s = get_settings()
        if len(argv) > 1 and argv[1] == "reset":
            s.reset()
            print("settings reset")
        for k, v in s.items():
            print(f"{k}={v}")
        return 0
    if head == "cfg":
        print(DEFAULT_CFG_PATH.read_text())
        return 0
    if head == "copy-cfg":
        import shutil

        dst = Path.cwd() / f"{DEFAULT_CFG_PATH.stem}_copy.yaml"
        shutil.copy2(DEFAULT_CFG_PATH, dst)
        print(
            f"copied default config to {dst}\n"
            f"usage example: yolo cfg={dst} imgsz=320"
        )
        return 0
    if head in ("hub", "login", "logout"):
        from ..hub.session import login, logout

        sub = argv[1] if head == "hub" and len(argv) > 1 else head
        if sub == "login":
            key = (argv[2:] if head == "hub" else argv[1:]) or [""]
            login(key[0])
        elif sub == "logout":
            logout()
        else:
            print("usage: yolo hub login KEY | yolo hub logout")
        return 0
    task = mode = None
    kv = []
    for a in argv:
        if a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        else:
            kv.append(a)
    overrides = parse_key_value_args(kv)
    task = task or overrides.pop("task", None) or "detect"
    mode = mode or overrides.pop("mode", None) or "predict"
    if mode not in MODES:
        raise ValueError(f"mode '{mode}' not in {MODES}")

    from ..engine.model import YOLO

    model_path = overrides.pop("model", None) or TASK2MODEL[task]
    model = YOLO(model_path, task=task)
    result = getattr(model, mode)(**overrides)
    if isinstance(result, dict):  # metrics: print, don't hand a truthy dict
        print(result)             # to sys.exit (which would exit 1)
    elif mode == "predict" and result is not None:
        for r in result if isinstance(result, (list, tuple)) else [result]:
            print(r)
    return 0
