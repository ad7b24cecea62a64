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


def img2label_paths(img_paths):
    """images/ -> labels/ sibling .txt paths (reference data/utils.py:35)."""
    import os

    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [
        sb.join(str(p).rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for p in img_paths
    ]


def autosplit(path, weights=(0.9, 0.1, 0.0), annotated_only: bool = False):
    """Split an images dir into autosplit_{train,val,test}.txt index files
    (reference data/utils.py:538). Deterministic (seed 0)."""
    import random

    from .dataset import IMG_FORMATS
    from ..utils import LOGGER

    path = Path(path)
    files = sorted(x for x in path.rglob("*.*") if x.suffix.lower() in IMG_FORMATS)
    rng = random.Random(0)
    indices = rng.choices([0, 1, 2], weights=weights, k=len(files))
    txt = ["autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt"]
    for t in txt:
        (path.parent / t).unlink(missing_ok=True)
    LOGGER.info(
        f"autosplitting {len(files)} images from {path}"
        + ", labeled only" * annotated_only
    )
    for i, img in zip(indices, files):
        if annotated_only and not Path(img2label_paths([str(img)])[0]).exists():
            continue
        with open(path.parent / txt[i], "a") as fh:
            fh.write(f"./{img.relative_to(path.parent).as_posix()}\n")
    return [path.parent / t for t in txt]


class HUBDatasetStats:
    """Dataset statistics + preview-image packaging for registry upload
    (reference data/utils.py:329): per-split instance/image counts, rounded
    label lists, compressed previews under <path>-hub/."""

    def __init__(self, path, task: str = "detect"):
        from ..utils import LOGGER
        from ..utils.downloads import unzip_file

        LOGGER.info(f"starting HUB dataset checks for {path}")
        p = Path(path)
        if p.suffix == ".zip":
            root = Path(unzip_file(p, path=p.parent))
            yamls = sorted(root.glob("*.yaml")) or sorted(root.rglob("*.yaml"))
            assert yamls, f"no *.yaml found in {p}"
            data = check_det_dataset(str(yamls[0]))
            data["path"] = str(root)
        else:
            data = check_det_dataset(str(p))
        self.data = data
        self.task = task
        self.hub_dir = Path(str(data.get("path", Path(data["val"]).parent)) + "-hub")
        self.im_dir = self.hub_dir / "images"
        self.im_dir.mkdir(parents=True, exist_ok=True)
        self.stats = {"nc": data["nc"], "names": list(data["names"].values())}

    def _split_labels(self, split):
        from .dataset import YOLODataset

        ds = YOLODataset(
            self.data[split], imgsz=64, augment=False,
            use_segments=self.task == "segment",
            kpt_shape=self.data.get("kpt_shape") if self.task == "pose" else None,
        )
        return ds

    def get_json(self, save: bool = False):
        import json

        import numpy as np

        for split in ("train", "val", "test"):
            if self.data.get(split) is None or not Path(self.data[split]).exists():
                self.stats[split] = None
                continue
            ds = self._split_labels(split)
            counts = np.array([
                np.bincount(lab["cls"].astype(int).reshape(-1), minlength=self.data["nc"])
                for lab in ds.labels
            ])
            rounded = []
            for lab in ds.labels:
                if self.task == "segment":
                    coords = [s.reshape(-1) for s in lab["segments"]]
                elif self.task == "pose" and "keypoints" in lab:
                    n = lab["keypoints"].shape[0]
                    coords = np.concatenate(
                        [lab["bboxes"], lab["keypoints"].reshape(n, -1)], 1
                    )
                else:
                    coords = lab["bboxes"]
                rounded.append([
                    [int(c), *(round(float(x), 4) for x in np.asarray(pts).reshape(-1))]
                    for c, pts in zip(lab["cls"].reshape(-1), coords)
                ])
            self.stats[split] = {
                "instance_stats": {
                    "total": int(counts.sum()),
                    "per_class": counts.sum(0).tolist(),
                },
                "image_stats": {
                    "total": len(ds),
                    "unlabelled": int((counts.sum(1) == 0).sum()),
                    "per_class": (counts > 0).sum(0).tolist(),
                },
                "labels": [
                    {Path(f).name: r} for f, r in zip(ds.im_files, rounded)
                ],
            }
        if save:
            with open(self.hub_dir / "stats.json", "w") as fh:
                json.dump(self.stats, fh)
        return self.stats

    def process_images(self, max_dim: int = 1920, quality: int = 50):
        """Compressed previews (reference compress_one_image)."""
        import cv2

        for split in ("train", "val", "test"):
            if self.data.get(split) is None or not Path(self.data[split]).exists():
                continue
            for f in self._split_labels(split).im_files:
                img = cv2.imread(f)
                if img is None:
                    continue
                h, w = img.shape[:2]
                r = max_dim / max(h, w)
                if r < 1:
                    img = cv2.resize(img, (int(w * r), int(h * r)),
                                     interpolation=cv2.INTER_AREA)
                cv2.imwrite(
                    str(self.im_dir / f"{split}_{Path(f).name}"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, quality],
                )
        return self.im_dir
