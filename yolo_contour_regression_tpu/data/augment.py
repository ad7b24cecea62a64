"""Augmentation pipeline — host-side numpy/cv2, contour-aware.

Re-implementation of the reference ``data/augment.py`` transform chain
(``v8_transforms`` augment.py:918): Mosaic 4-grid (:118), MixUp beta(32,32)
(:270), RandomPerspective warping image AND the (N,360,2) contour tensor
(:289, apply_segments :373), RandomHSV (:511), RandomFlip (:536), LetterBox
(:570), plus the fork's grayscale classification transforms (:950-1176).

Output contract is fixed-shape: ``format_batch`` pads instances to
``max_instances`` and emits the dense GT dict the jitted loss consumes —
replacing the reference's ragged list-of-segments collate (dataset.py:226).
"""
from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..ops.polar import NUM_CONTOUR_POINTS
from .instance import Instances


class Sample:
    """One image + labels mid-pipeline. img uint8 HWC BGR; inst in px.

    ``ori_shape``/``ratio_pad`` record the native image size and the letterbox
    transform (gain, pad_x, pad_y) so validators can scale predictions back to
    native image space (reference ops.py:872 scale_boxes semantics). They are
    set by ``letterbox_sample`` and meaningless for train-augmented samples
    (identity)."""

    __slots__ = ("img", "inst", "ori_shape", "ratio_pad")

    def __init__(self, img: np.ndarray, inst: Instances, ori_shape=None, ratio_pad=None):
        self.img = img
        self.inst = inst
        self.ori_shape = ori_shape
        self.ratio_pad = ratio_pad


def letterbox(
    img: np.ndarray,
    new_shape: Tuple[int, int],
    color: int = 114,
    scaleup: bool = True,
    center: bool = True,
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Aspect-preserving resize + pad (reference augment.py:570 LetterBox).
    Returns (img, gain, (pad_x, pad_y))."""
    h, w = img.shape[:2]
    r = min(new_shape[0] / h, new_shape[1] / w)
    if not scaleup:
        r = min(r, 1.0)
    nh, nw = round(h * r), round(w * r)
    if (nh, nw) != (h, w):
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    dh, dw = new_shape[0] - nh, new_shape[1] - nw
    if center:
        top, left = dh // 2, dw // 2
    else:
        top, left = 0, 0
    out = np.full((new_shape[0], new_shape[1], img.shape[2] if img.ndim == 3 else 1), color, img.dtype)
    out = out.reshape(new_shape[0], new_shape[1], -1)
    out[top : top + nh, left : left + nw] = img.reshape(nh, nw, -1)
    return out, r, (float(left), float(top))


def letterbox_sample(s: Sample, imgsz, scaleup: bool = True) -> Sample:
    """``imgsz``: int (square) or (h, w) tuple (rect val batches)."""
    h0, w0 = s.img.shape[:2]
    shape = (imgsz, imgsz) if isinstance(imgsz, int) else tuple(imgsz)
    img, r, (px, py) = letterbox(s.img, shape, scaleup=scaleup)
    inst = s.inst.copy()
    inst.scale(r, r)
    inst.translate(px, py)
    return Sample(img, inst, ori_shape=(h0, w0), ratio_pad=(r, px, py))


def mosaic4(samples: List[Sample], imgsz: int, rng: random.Random) -> Sample:
    """4-image mosaic on a 2x2 canvas (reference augment.py:155 _mosaic4):
    canvas 2*imgsz, random center in [imgsz/2, 3*imgsz/2]."""
    s = imgsz
    yc = int(rng.uniform(s // 2, 3 * s // 2))
    xc = int(rng.uniform(s // 2, 3 * s // 2))
    canvas = np.full((2 * s, 2 * s, 3), 114, np.uint8)
    insts = []
    for i, smp in enumerate(samples):
        img = smp.img
        h, w = img.shape[:2]
        # scale longest side to imgsz (reference load_image keeps ratio)
        r = s / max(h, w)
        if r != 1:
            img = cv2.resize(img, (round(w * r), round(h * r)))
        h, w = img.shape[:2]
        if i == 0:  # top-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, 2 * s), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(2 * s, yc + h)
            x1b, y1b = w - (x2a - x1a), 0
        else:  # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, 2 * s), min(2 * s, yc + h)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = img[y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)]
        inst = smp.inst.copy()
        inst.scale(r, r)
        inst.translate(x1a - x1b, y1a - y1b)
        insts.append(inst)
    inst = Instances.concatenate(insts)
    inst.clip(2 * s, 2 * s)
    return Sample(canvas, inst)


def random_perspective(
    s: Sample,
    imgsz: int,
    rng: random.Random,
    degrees: float = 0.0,
    translate: float = 0.1,
    scale: float = 0.5,
    shear: float = 0.0,
    perspective: float = 0.0,
    border: Tuple[int, int] = (0, 0),
) -> Sample:
    """Affine/perspective warp of image + contours (reference augment.py:289).
    border=(-imgsz/2, -imgsz/2) after mosaic crops the 2x canvas back."""
    img = s.img
    h0, w0 = img.shape[:2]
    width = int(w0 + border[1] * 2)
    height = int(h0 + border[0] * 2)

    C = np.eye(3)
    C[0, 2] = -w0 / 2
    C[1, 2] = -h0 / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    sc = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=sc)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height
    M = T @ S @ R @ P @ C

    if perspective:
        img = cv2.warpPerspective(img, M, dsize=(width, height), borderValue=(114, 114, 114))
    else:
        img = cv2.warpAffine(img, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    inst = s.inst.copy()
    n = len(inst)
    if n:
        pts = inst.segments.reshape(-1, 2)
        ones = np.ones((pts.shape[0], 1), np.float32)
        warped = np.concatenate([pts, ones], 1) @ M.T.astype(np.float32)
        if perspective:
            warped = warped[:, :2] / warped[:, 2:3]
        else:
            warped = warped[:, :2]
        inst.segments = warped.reshape(n, -1, 2)
        if inst.keypoints is not None:
            kxy = inst.keypoints[..., :2].reshape(-1, 2)
            ok = np.concatenate([kxy, np.ones((kxy.shape[0], 1), np.float32)], 1) @ M.T.astype(np.float32)
            ok = (ok[:, :2] / ok[:, 2:3]) if perspective else ok[:, :2]
            kw = inst.keypoints.shape[1]
            inst.keypoints[..., :2] = ok.reshape(n, kw, 2)
            # zero visibility for kpts warped out of frame (reference augment.py:398)
            out_of = (
                (inst.keypoints[..., 0] < 0) | (inst.keypoints[..., 0] > width)
                | (inst.keypoints[..., 1] < 0) | (inst.keypoints[..., 1] > height)
            )
            inst.keypoints[..., 2] = np.where(out_of, 0.0, inst.keypoints[..., 2])
        inst.segments[..., 0] = inst.segments[..., 0].clip(0, width)
        inst.segments[..., 1] = inst.segments[..., 1].clip(0, height)
        inst.sync_boxes_from_segments()
        # boxes without segments: warp corners
        no_seg = ~inst.segments.reshape(n, -1).any(1)
        if no_seg.any():
            bx = inst.bboxes[no_seg]
            corners = np.stack(
                [bx[:, [0, 1]], bx[:, [2, 1]], bx[:, [2, 3]], bx[:, [0, 3]]], 1
            ).reshape(-1, 2)
            ones = np.ones((corners.shape[0], 1), np.float32)
            wc = np.concatenate([corners, ones], 1) @ M.T.astype(np.float32)
            wc = (wc[:, :2] / wc[:, 2:3]) if perspective else wc[:, :2]
            wc = wc.reshape(-1, 4, 2)
            inst.bboxes[no_seg] = np.concatenate([wc.min(1), wc.max(1)], 1)
        inst.clip(width, height)
        inst = inst.remove_degenerate()
    return Sample(img, inst)


def mixup(a: Sample, b: Sample, rng: random.Random) -> Sample:
    """beta(32,32) image blend, labels concatenated (reference augment.py:270)."""
    r = np.random.beta(32.0, 32.0)
    img = (a.img.astype(np.float32) * r + b.img.astype(np.float32) * (1 - r)).astype(np.uint8)
    return Sample(img, Instances.concatenate([a.inst, b.inst]))


def random_hsv(img: np.ndarray, rng: random.Random, hgain=0.015, sgain=0.7, vgain=0.4):
    """HSV jitter (reference augment.py:511 RandomHSV)."""
    if hgain or sgain or vgain:
        r = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(256)
        lut_h = ((x * r[0]) % 180).astype(img.dtype)
        lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
        img = cv2.cvtColor(
            cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v))),
            cv2.COLOR_HSV2BGR,
        )
    return img


def random_flip(s: Sample, rng: random.Random, fliplr: float = 0.5, flipud: float = 0.0, flip_idx=None) -> Sample:
    h, w = s.img.shape[:2]
    if rng.random() < flipud:
        s.img = np.flipud(s.img).copy()
        s.inst.flipud(h)
    if rng.random() < fliplr:
        s.img = np.fliplr(s.img).copy()
        s.inst.fliplr(w, flip_idx)
    return s


def train_transform(get_sample, index: int, n_total: int, imgsz: int, hyp, rng: random.Random, flip_idx=None) -> Sample:
    """The v8_transforms train chain for one output sample
    (reference augment.py:918): mosaic(p) -> perspective -> mixup(p) ->
    hsv -> flips. `get_sample(i)` loads raw Sample i."""
    use_mosaic = rng.random() < hyp.mosaic
    if use_mosaic:
        if rng.random() < getattr(hyp, "mosaic9", 0.0):
            # 9-grid variant (reference augment.py:209 _mosaic9), enabled by
            # the mosaic9 hyp as the fraction of mosaics built on a 3x3 grid
            idxs = [index] + [rng.randrange(n_total) for _ in range(8)]
            s = mosaic9([get_sample(i) for i in idxs], imgsz, rng)
        else:
            idxs = [index] + [rng.randrange(n_total) for _ in range(3)]
            s = mosaic4([get_sample(i) for i in idxs], imgsz, rng)
        if getattr(hyp, "copy_paste", 0.0) > 0:
            s = copy_paste(s, hyp.copy_paste, rng)
        border = (-imgsz // 2, -imgsz // 2)
        s = random_perspective(
            s, imgsz, rng, hyp.degrees, hyp.translate, hyp.scale, hyp.shear,
            hyp.perspective, border,
        )
        if rng.random() < hyp.mixup:
            idxs2 = [rng.randrange(n_total) for _ in range(4)]
            s2 = mosaic4([get_sample(i) for i in idxs2], imgsz, rng)
            s2 = random_perspective(
                s2, imgsz, rng, hyp.degrees, hyp.translate, hyp.scale, hyp.shear,
                hyp.perspective, border,
            )
            s = mixup(s, s2, rng)
    else:
        s = letterbox_sample(get_sample(index), imgsz, scaleup=True)
        s = random_perspective(
            s, imgsz, rng, hyp.degrees, hyp.translate, hyp.scale, hyp.shear,
            hyp.perspective, (0, 0),
        )
    s.img = pixel_augment(s.img, rng)
    s.img = random_hsv(s.img, rng, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v)
    s = random_flip(s, rng, hyp.fliplr, hyp.flipud, flip_idx)
    return s


def pixel_augment(img: np.ndarray, rng: random.Random, p: float = 0.01) -> np.ndarray:
    """Native equivalents of the reference's active Albumentations transforms
    (augment.py:706-713: Blur/MedianBlur/ToGray/CLAHE, each p=0.01), applied
    at the same pipeline position — no albumentations dependency. Pixel-only:
    boxes/segments/keypoints are untouched."""
    if rng.random() < p:  # Blur
        k = rng.choice([3, 5, 7])
        img = cv2.blur(img, (k, k))
    if rng.random() < p:  # MedianBlur
        img = cv2.medianBlur(img, rng.choice([3, 5, 7]))
    if rng.random() < p:  # ToGray
        img = cv2.cvtColor(
            cv2.cvtColor(img, cv2.COLOR_BGR2GRAY), cv2.COLOR_GRAY2BGR
        )
    if rng.random() < p:  # CLAHE (8x8 tiles, clip 4 — albumentations defaults)
        clahe = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(8, 8))
        lab = cv2.cvtColor(img, cv2.COLOR_BGR2LAB)
        lab[..., 0] = clahe.apply(lab[..., 0])
        img = cv2.cvtColor(lab, cv2.COLOR_LAB2BGR)
    return img


def format_sample(s: Sample, max_instances: int) -> Dict[str, np.ndarray]:
    """Sample -> dense per-image GT dict, normalized coords
    (replaces reference Format augment.py:801 + collate dataset.py:226)."""
    h, w = s.img.shape[:2]
    n = min(len(s.inst), max_instances)
    cls = np.zeros((max_instances,), np.int32)
    bboxes = np.zeros((max_instances, 4), np.float32)
    segments = np.zeros((max_instances, NUM_CONTOUR_POINTS, 2), np.float32)
    mask = np.zeros((max_instances,), bool)
    if n:
        inst = s.inst
        cls[:n] = inst.cls[:n].astype(np.int32)
        xyxy = inst.bboxes[:n]
        xywh = np.concatenate([(xyxy[:, :2] + xyxy[:, 2:]) / 2, xyxy[:, 2:] - xyxy[:, :2]], -1)
        bboxes[:n] = xywh / np.array([w, h, w, h], np.float32)
        segments[:n] = inst.segments[:n] / np.array([w, h], np.float32)
        mask[:n] = True
    img = cv2.cvtColor(s.img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    out = {
        "img": img,
        "cls": cls,
        "bboxes": bboxes,
        "segments": segments,
        "mask_gt": mask,
        # native-space metadata for COCO-protocol eval (identity for
        # train-augmented samples, which have no meaningful native frame)
        "ori_shape": np.asarray(s.ori_shape if s.ori_shape else (h, w), np.float32),
        "ratio_pad": np.asarray(s.ratio_pad if s.ratio_pad else (1.0, 0.0, 0.0), np.float32),
    }
    if s.inst.keypoints is not None:
        K = s.inst.keypoints.shape[1]
        kpts = np.zeros((max_instances, K, 3), np.float32)
        if n:
            kpts[:n] = s.inst.keypoints[:n]
            kpts[:n, :, 0] /= w
            kpts[:n, :, 1] /= h
        out["keypoints"] = kpts
    return out


def format_sample_raw(s: Sample, max_instances: int) -> Dict[str, np.ndarray]:
    """Sample -> raw-batch dict for the DEVICE augmentation stage
    (data/device_augment.py): uint8 BGR letterboxed image + normalized
    labels + the letterbox geometry (content size / top-left pad) that the
    device mosaic needs for corner-at-center tile placement."""
    h, w = s.img.shape[:2]
    n = min(len(s.inst), max_instances)
    cls = np.zeros((max_instances,), np.int32)
    bboxes = np.zeros((max_instances, 4), np.float32)
    segments = np.zeros((max_instances, NUM_CONTOUR_POINTS, 2), np.float32)
    mask = np.zeros((max_instances,), bool)
    if n:
        inst = s.inst
        cls[:n] = inst.cls[:n].astype(np.int32)
        xyxy = inst.bboxes[:n]
        xywh = np.concatenate([(xyxy[:, :2] + xyxy[:, 2:]) / 2, xyxy[:, 2:] - xyxy[:, :2]], -1)
        bboxes[:n] = xywh / np.array([w, h, w, h], np.float32)
        segments[:n] = inst.segments[:n] / np.array([w, h], np.float32)
        mask[:n] = True
    r, px, py = s.ratio_pad if s.ratio_pad else (1.0, 0.0, 0.0)
    h0, w0 = s.ori_shape if s.ori_shape else (h, w)
    out = {
        "img": np.ascontiguousarray(s.img, np.uint8),
        "cls": cls,
        "bboxes": bboxes,
        "segments": segments,
        "mask_gt": mask,
        "content_hw": np.asarray([round(h0 * r), round(w0 * r)], np.float32),
        "pad_tl": np.asarray([py, px], np.float32),
    }
    if s.inst.keypoints is not None:
        K = s.inst.keypoints.shape[1]
        kpts = np.zeros((max_instances, K, 3), np.float32)
        if n:
            kpts[:n] = s.inst.keypoints[:n]
            kpts[:n, :, 0] /= w
            kpts[:n, :, 1] /= h
        out["keypoints"] = kpts
    return out


INSTANCE_BUCKETS = (8, 16, 32)


def collate(samples: List[Dict[str, np.ndarray]], bucket_instances: bool = True) -> Dict[str, np.ndarray]:
    """Stack per-image dicts; trim the padded instance axis to the smallest
    bucket holding the batch's max instance count (8/16/32/max_instances).

    The polar assigner's cost is shape-driven — B x N_pad x cand GT-ray
    pairs — so padding every batch to max_instances (48) made every train
    step pay the worst case. Bucketing keeps shapes static per bucket (at
    most 4 jit variants, each compiled once) while typical batches (<8
    objects/img) run ~6x less assigner work."""
    out = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    if bucket_instances and "mask_gt" in out:
        n_pad = out["mask_gt"].shape[1]
        n_act = int(out["mask_gt"].sum(axis=1).max()) if out["mask_gt"].size else 0
        cap = n_pad
        for b in INSTANCE_BUCKETS:
            if n_act <= b < n_pad:
                cap = b
                break
        if cap < n_pad:
            for k in ("cls", "bboxes", "segments", "mask_gt", "keypoints"):
                if k in out and out[k].ndim >= 2 and out[k].shape[1] == n_pad:
                    out[k] = out[k][:, :cap]
    return out


def mosaic9(samples: List[Sample], imgsz: int, rng: random.Random) -> Sample:
    """9-image mosaic on a 3x3 canvas (reference augment.py:209 _mosaic9)."""
    s = imgsz
    canvas = np.full((3 * s, 3 * s, 3), 114, np.uint8)
    insts = []
    # 3x3 grid cells, center cell first like the reference ordering
    order = [(1, 1), (0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)]
    for (gy, gx), smp in zip(order, samples):
        img = smp.img
        h, w = img.shape[:2]
        r = s / max(h, w)
        if r != 1:
            img = cv2.resize(img, (round(w * r), round(h * r)))
        h, w = img.shape[:2]
        y0, x0 = gy * s, gx * s
        canvas[y0 : y0 + h, x0 : x0 + w] = img
        inst = smp.inst.copy()
        inst.scale(r, r)
        inst.translate(x0, y0)
        insts.append(inst)
    inst = Instances.concatenate(insts)
    # crop the central 2s x 2s region (reference crops with random offset;
    # fixed center keeps fixed shapes for the downstream border crop)
    ox = oy = s // 2
    out = canvas[oy : oy + 2 * s, ox : ox + 2 * s]
    inst.translate(-ox, -oy)
    inst.clip(2 * s, 2 * s)
    inst = inst.remove_degenerate()
    return Sample(np.ascontiguousarray(out), inst)


def copy_paste(s: Sample, p: float, rng: random.Random) -> Sample:
    """Instance copy-paste via contour masks (reference augment.py:640
    CopyPaste): flip instances horizontally and paste where they don't
    collide (ioa < 0.3) with existing boxes."""
    n = len(s.inst)
    if p <= 0 or n == 0 or not s.inst.segments.reshape(n, -1).any():
        return s
    h, w = s.img.shape[:2]
    flipped = s.inst.copy()
    flipped.fliplr(w)
    from ..ops.boxes import bbox_ioa as _  # noqa: F401  (jnp variant unused here)

    def ioa(a, b):  # (4,), (m, 4) -> (m,)
        lt = np.maximum(a[:2], b[:, :2])
        rb = np.minimum(a[2:], b[:, 2:])
        inter = np.clip(rb - lt, 0, None).prod(-1)
        area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
        return inter / (area_b + 1e-7)

    pasted = []
    for i in rng.sample(range(n), max(1, round(p * n))):
        box = flipped.bboxes[i]
        if (box[2] - box[0]) < 2 or (box[3] - box[1]) < 2:
            continue
        if ioa(box, s.inst.bboxes).max(initial=0.0) > 0.30:
            continue
        seg = flipped.segments[i]
        if not seg.any():
            continue
        mask = np.zeros((h, w), np.uint8)
        cv2.fillPoly(mask, [seg.astype(np.int32)], 1)
        src = np.fliplr(s.img)
        s.img = np.where(mask[..., None] == 1, src, s.img)
        pasted.append(i)
    if pasted:
        s.inst = Instances.concatenate([s.inst, flipped.select(np.asarray(pasted))])
    return s


# ---- fork's grayscale classification transforms (augment.py:950-1176) ------

def classify_transform_train(img: np.ndarray, imgsz: int, rng: random.Random) -> np.ndarray:
    """Grayscale + resize + brightness/noise jitter -> (H, W, 3) f32 0-1."""
    g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    g = cv2.resize(g, (imgsz, imgsz))
    # brightness jitter
    b = rng.uniform(0.6, 1.4)
    g = np.clip(g.astype(np.float32) * b, 0, 255)
    # gaussian noise
    if rng.random() < 0.5:
        g = np.clip(g + np.random.normal(0, 8, g.shape), 0, 255)
    g = (g / 255.0).astype(np.float32)
    return np.repeat(g[..., None], 3, -1)


def classify_transform_eval(img: np.ndarray, imgsz: int) -> np.ndarray:
    g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    g = cv2.resize(g, (imgsz, imgsz))
    g = (g.astype(np.float32) / 255.0)
    return np.repeat(g[..., None], 3, -1)
