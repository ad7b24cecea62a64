"""Datasets — YOLO-format detection/segmentation + folder classification.

Re-implementation of the reference data layer (``data/dataset.py`` YOLODataset
label caching :42-175, ``data/base.py`` BaseDataset scanning, and
``data/utils.py`` verify_image_label :64): scans images, parses YOLO txt
labels (class + xywh or class + polygon), resamples every polygon to 360
points at load (reference instance.py:202), caches parsed labels as an .npz
beside the label dir, and serves augmented fixed-shape samples.
"""
from __future__ import annotations

import hashlib
import os
import random
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np

from ..ops.polar import NUM_CONTOUR_POINTS
from .augment import (
    Sample,
    classify_transform_eval,
    classify_transform_train,
    format_sample,
    format_sample_raw,
    letterbox_sample,
    train_transform,
)
from .instance import Instances, resample_segment, segments2boxes

IMG_FORMATS = (".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp")


def img2label_path(img_path: str) -> str:
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return sb.join(img_path.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"


def parse_label_file(path: str, nc: Optional[int] = None, kpt_shape=None):
    """YOLO txt -> (cls (n,), bboxes xywh-norm (n,4), segments (n,360,2) norm
    [, keypoints (n, K, 3)]).

    Line formats (reference verify_image_label data/utils.py:64):
      - 5 numbers: class + xywh box
      - 5 + K*2 or K*3 with kpt_shape set: box + keypoints (pose datasets)
      - >5 numbers otherwise: class + polygon
    """
    cls, boxes, segs, kpts = [], [], [], []
    nk = kpt_shape[0] if kpt_shape else 0
    nd = kpt_shape[1] if kpt_shape else 0
    if os.path.isfile(path):
        with open(path) as fh:
            for line in fh:
                parts = line.split()
                if len(parts) < 5:
                    continue
                c = int(float(parts[0]))
                if nc is not None and c >= nc:
                    continue
                vals = np.asarray([float(v) for v in parts[1:]], np.float32)
                if kpt_shape and len(vals) == 4 + nk * nd:
                    cls.append(c)
                    boxes.append(vals[:4])
                    segs.append(np.zeros((NUM_CONTOUR_POINTS, 2), np.float32))
                    k = vals[4:].reshape(nk, nd)
                    if nd == 2:  # add implicit full visibility
                        k = np.concatenate([k, np.ones((nk, 1), np.float32)], -1)
                    kpts.append(k)
                elif len(vals) == 4:
                    cls.append(c)
                    boxes.append(vals)
                    segs.append(np.zeros((NUM_CONTOUR_POINTS, 2), np.float32))
                    kpts.append(np.zeros((max(nk, 1), 3), np.float32))
                else:
                    poly = vals.reshape(-1, 2)
                    seg = resample_segment(poly)
                    cls.append(c)
                    boxes.append(segments2boxes(seg[None])[0])
                    segs.append(seg)
                    kpts.append(np.zeros((max(nk, 1), 3), np.float32))
    if not cls:
        out = (
            np.zeros((0,), np.int32),
            np.zeros((0, 4), np.float32),
            np.zeros((0, NUM_CONTOUR_POINTS, 2), np.float32),
        )
        return out + ((np.zeros((0, max(nk, 1), 3), np.float32),) if kpt_shape else ())
    out = (np.asarray(cls, np.int32), np.stack(boxes), np.stack(segs))
    return out + ((np.stack(kpts),) if kpt_shape else ())


class YOLODataset:
    """Detection/segmentation dataset over an images dir or list file."""

    def __init__(
        self,
        img_path,
        imgsz: int = 640,
        augment: bool = False,
        hyp=None,
        max_instances: int = 48,
        use_segments: bool = True,
        single_cls: bool = False,
        fraction: float = 1.0,
        rect: bool = False,
        seed: int = 0,
        cache: bool = True,
        cache_images=False,
        kpt_shape=None,
        flip_idx=None,
        device_augment: bool = False,
    ):
        self.device_augment = bool(device_augment)
        self.kpt_shape = tuple(kpt_shape) if kpt_shape else None
        self.flip_idx = tuple(flip_idx) if flip_idx else None
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp
        self.max_instances = max_instances
        self.use_segments = use_segments
        self.single_cls = single_cls
        self.rng = random.Random(seed)
        self.im_files = self._scan(img_path, fraction)
        if not self.im_files:
            raise FileNotFoundError(f"no images found in {img_path}")
        self.labels = self._load_labels(cache)
        self.mosaic_enabled = augment
        # decoded-image cache (reference data/base.py:23-326 cache_images):
        # 'ram'/True keeps decoded uint8 arrays in memory; 'disk' stores .npy
        # beside a .img_cache dir and mmap-loads them — on a 1-core TPU host
        # JPEG decode dominates the input pipeline, so this is the difference
        # between loader-bound and device-bound training
        self.cache_images = (
            "ram" if cache_images is True else (str(cache_images).lower() if cache_images else "")
        )
        self._ram: List[Optional[np.ndarray]] = [None] * len(self.im_files)
        if self.cache_images == "disk":
            self._disk_dir = Path(self.im_files[0]).parent / ".img_cache"
            self._disk_dir.mkdir(exist_ok=True)
        # rect val (reference data/base.py:127 set_rectangle): aspect-sorted
        # batches letterboxed to per-batch stride-32 shapes -> less padding
        # per batch. Each distinct shape costs one XLA compile, so shapes are
        # quantized to /32; the loader follows self.order.
        self.rect = bool(rect) and not augment
        self.order: Optional[List[int]] = None
        self._batch_shape: Optional[List] = None

    def set_rectangle(self, batch_size: int, stride: int = 32, pad: float = 0.5):
        """Compute aspect-sorted order + per-index letterbox shapes
        (reference data/base.py:127-152)."""
        from PIL import Image

        n = len(self.im_files)
        ar = np.empty(n, np.float64)
        for i, f in enumerate(self.im_files):
            with Image.open(f) as im:
                w, h = im.size
            ar[i] = h / w
        order = np.argsort(ar).tolist()
        self.order = order
        self._batch_shape = [None] * n
        nb = (n + batch_size - 1) // batch_size
        for b in range(nb):
            idxs = order[b * batch_size : (b + 1) * batch_size]
            ari = ar[idxs]
            mini, maxi = float(ari.min()), float(ari.max())
            shape = [1.0, 1.0]
            if maxi < 1:
                shape = [maxi, 1.0]
            elif mini > 1:
                shape = [1.0, 1.0 / mini]
            hw = np.ceil(np.array(shape) * self.imgsz / stride + pad).astype(int) * stride
            for i in idxs:
                self._batch_shape[i] = (int(hw[0]), int(hw[1]))

    def _scan(self, img_path, fraction) -> List[str]:
        files: List[str] = []
        for p in img_path if isinstance(img_path, (list, tuple)) else [img_path]:
            p = Path(p)
            if p.is_dir():
                files += sorted(
                    str(f) for f in p.rglob("*") if f.suffix.lower() in IMG_FORMATS
                )
            elif p.is_file() and p.suffix == ".txt":
                base = p.parent
                with open(p) as fh:
                    for line in fh:
                        line = line.strip()
                        if line:
                            f = line if os.path.isabs(line) else str(base / line)
                            files.append(f)
            elif p.is_file():
                files.append(str(p))
        if fraction < 1.0:
            files = files[: max(1, round(len(files) * fraction))]
        return files

    def _cache_path(self) -> Path:
        h = hashlib.sha1(("".join(self.im_files)).encode()).hexdigest()[:12]
        first = Path(self.im_files[0])
        return first.parent / f".label_cache_{h}.npz"

    def _load_labels(self, cache: bool) -> List[Dict[str, np.ndarray]]:
        cpath = self._cache_path()
        if cache and cpath.exists():
            try:
                z = np.load(cpath, allow_pickle=True)
                return list(z["labels"])
            except Exception:
                pass
        labels = []
        for f in self.im_files:
            parsed = parse_label_file(img2label_path(f), kpt_shape=self.kpt_shape)
            c, b, s = parsed[:3]
            if self.single_cls:
                c = np.zeros_like(c)
            lab = {"cls": c, "bboxes": b, "segments": s}
            if self.kpt_shape:
                lab["keypoints"] = parsed[3]
            labels.append(lab)
        if cache:
            try:
                np.savez_compressed(cpath, labels=np.asarray(labels, dtype=object))
            except Exception:
                pass
        return labels

    def __len__(self):
        return len(self.im_files)

    def close_mosaic(self):
        """Disable mosaic/mixup for final epochs (reference trainer.py:304)."""
        self.mosaic_enabled = False

    def _decode_resized(self, i: int) -> np.ndarray:
        """Decode + pre-resize so the long side == imgsz (reference
        data/base.py:158 load_image): every downstream consumer (mosaic,
        letterbox) rescales to ~imgsz anyway, so caching the resized image
        cuts both cached-epoch resize cost and RAM ~(orig/imgsz)^2-fold.
        Labels are normalized, so geometry is unaffected."""
        img = cv2.imread(self.im_files[i])
        if img is None:
            raise FileNotFoundError(self.im_files[i])
        h, w = img.shape[:2]
        r = self.imgsz / max(h, w)
        if r != 1.0:
            interp = cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA
            img = cv2.resize(
                img,
                (min(int(round(w * r)), self.imgsz), min(int(round(h * r)), self.imgsz)),
                interpolation=interp,
            )
        return img

    def _read_image(self, i: int) -> np.ndarray:
        if self.cache_images == "ram":
            img = self._ram[i]
            if img is None:
                img = self._ram[i] = self._decode_resized(i)
            return img
        if self.cache_images == "disk":
            f = self._disk_dir / (Path(self.im_files[i]).stem + f"_{i}.npy")
            if f.exists():
                return np.load(f, mmap_mode="r")
            img = self._decode_resized(i)
            try:
                np.save(f, img)
            except OSError:
                pass  # disk full: fall through, keep decoding
            return img
        return self._decode_resized(i)

    def load_raw(self, i: int) -> Sample:
        img = np.asarray(self._read_image(i))
        h, w = img.shape[:2]
        lab = self.labels[i]
        xywh = lab["bboxes"] * np.array([w, h, w, h], np.float32)
        xyxy = np.concatenate([xywh[:, :2] - xywh[:, 2:] / 2, xywh[:, :2] + xywh[:, 2:] / 2], -1)
        segs = lab["segments"] * np.array([w, h], np.float32)
        kpts = None
        if self.kpt_shape and "keypoints" in lab:
            kpts = lab["keypoints"].copy()
            kpts[..., 0] *= w
            kpts[..., 1] *= h
        return Sample(img, Instances(lab["cls"].astype(np.float32), xyxy, segs, kpts))

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if self.device_augment and self.augment:
            # device-augmentation mode: host does decode + letterbox only;
            # mosaic/affine/mixup/HSV/flips run on-device
            # (data/device_augment.py). close_mosaic is handled by the
            # trainer swapping the device hyp, not here.
            s = letterbox_sample(self.load_raw(i), self.imgsz, scaleup=True)
            return format_sample_raw(s, self.max_instances)
        if self.augment and self.hyp is not None:
            hyp = self.hyp
            if not self.mosaic_enabled:
                import copy as _copy

                hyp = _copy.copy(hyp)
                hyp.mosaic = 0.0
                hyp.mixup = 0.0
            s = train_transform(self.load_raw, i, len(self), self.imgsz, hyp,
                                self.rng, flip_idx=self.flip_idx)
        else:
            shape = (
                self._batch_shape[i]
                if self.rect and self._batch_shape is not None
                else self.imgsz
            )
            s = letterbox_sample(self.load_raw(i), shape, scaleup=False)
        return format_sample(s, self.max_instances)

    def get_shapes(self, i: int):
        img = cv2.imread(self.im_files[i])
        return img.shape[:2]


class ClassificationDataset:
    """ImageNet-style root/{class}/img layout with the fork's grayscale
    transforms (reference data/dataset.py:252 ClassificationDataset +
    augment.py:950 classify_transforms)."""

    def __init__(self, root, imgsz: int = 224, augment: bool = False, seed: int = 0):
        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
        self.rng = random.Random(seed)
        self.classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.samples = [
            (str(f), ci)
            for ci, cname in enumerate(self.classes)
            for f in sorted((self.root / cname).rglob("*"))
            if f.suffix.lower() in IMG_FORMATS
        ]
        if not self.samples:
            raise FileNotFoundError(f"no classification images under {root}")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int):
        path, label = self.samples[i]
        img = cv2.imread(path)
        if self.augment:
            x = classify_transform_train(img, self.imgsz, self.rng)
        else:
            x = classify_transform_eval(img, self.imgsz)
        return {"img": x, "cls": np.int32(label)}
