"""Dataset yaml checking/resolution (reference data/utils.py:199
check_det_dataset / :279 check_cls_dataset — minus auto-download, which is
gated off in the zero-egress TPU environment)."""
from __future__ import annotations

from pathlib import Path
from typing import Dict

import yaml


def check_det_dataset(data) -> Dict:
    """Load + validate a detection/segmentation dataset yaml.

    Keys: path (root), train/val/test (dirs or txt lists), names (dict or list),
    nc (optional, derived from names)."""
    if isinstance(data, dict):
        d = dict(data)
        base = Path(d.get("path", "."))
    else:
        p = Path(data)
        if not p.exists():
            from ..cfg import DATASETS_DIR

            cand = DATASETS_DIR / p.name
            if cand.exists():
                p = cand
            else:
                raise FileNotFoundError(f"dataset yaml not found: {data}")
        with open(p) as fh:
            d = yaml.safe_load(fh)
        base = Path(d.get("path", p.parent))
        if not base.is_absolute():
            base = (p.parent / base).resolve()
    names = d.get("names")
    if isinstance(names, list):
        names = {i: n for i, n in enumerate(names)}
    elif isinstance(names, dict):
        names = {int(k): v for k, v in names.items()}
    elif "nc" in d:
        names = {i: f"class{i}" for i in range(int(d["nc"]))}
    else:
        raise KeyError("dataset yaml needs 'names' or 'nc'")
    d["names"] = names
    d["nc"] = len(names)
    for split in ("train", "val", "test"):
        v = d.get(split)
        if v is None:
            continue
        vp = Path(v)
        d[split] = str(vp if vp.is_absolute() else base / vp)
    if "val" not in d or d.get("val") is None:
        d["val"] = d.get("test") or d.get("train")
    # dataset auto-download (reference data/utils.py check_det_dataset: runs
    # the yaml's 'download' URL(s) when the val split is missing on disk;
    # script-style download recipes are logged, not executed)
    val = d.get("val")
    if val and not Path(val).exists() and d.get("download"):
        dl = d["download"]
        if isinstance(dl, str) and dl.lstrip().startswith(("http://", "https://")):
            from ..utils.downloads import download

            download(dl.split(), dir=base, unzip=True, delete=True)
        else:
            from ..utils import LOGGER

            LOGGER.warning(
                f"dataset split '{val}' missing; yaml 'download' is a script "
                "recipe — run it manually (auto-exec of shell/python recipes "
                "is disabled in this build)"
            )
    return d


def check_cls_dataset(data) -> Dict:
    """Classification dataset: a root dir with train/ val|test/ class folders."""
    base = Path(data)
    if not base.exists():
        raise FileNotFoundError(f"classification dataset not found: {data}")
    train = base / "train" if (base / "train").exists() else base
    val = None
    for cand in ("val", "test", "validation"):
        if (base / cand).exists():
            val = base / cand
            break
    classes = sorted(d.name for d in train.iterdir() if d.is_dir())
    return {
        "train": str(train),
        "val": str(val or train),
        "names": {i: c for i, c in enumerate(classes)},
        "nc": len(classes),
    }
