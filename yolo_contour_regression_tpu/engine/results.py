"""Inference result containers (reference engine/results.py: Results :165,
Boxes :375, Masks :463, Probs :562) — numpy-backed, torch-free."""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class Boxes:
    """data rows: [x1, y1, x2, y2, conf, cls]."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, np.float32).reshape(-1, 6)
        self.orig_shape = orig_shape

    def __len__(self):
        return self.data.shape[0]

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, 4]

    @property
    def cls(self):
        return self.data[:, 5]

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.concatenate([(b[:, :2] + b[:, 2:]) / 2, b[:, 2:] - b[:, :2]], -1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.array([w, h, w, h], np.float32)

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h], np.float32)


class Masks:
    """Binary masks (n, H, W) + lazy polygon access."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def __len__(self):
        return self.data.shape[0]

    @property
    def xy(self):
        """Largest contour per mask in pixel coords (reference masks2segments
        ops.py:907)."""
        import cv2

        out = []
        for m in self.data.astype(np.uint8):
            cs, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            if cs:
                c = max(cs, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
            else:
                c = np.zeros((0, 2), np.float32)
            out.append(c)
        return out

    @property
    def xyn(self):
        h, w = self.orig_shape
        return [c / np.array([w, h], np.float32) for c in self.xy]


class Contours:
    """Polar contours (n, 36, 2) px + validity (n, 36) — the polar head's
    native instance representation (no reference equivalent: the reference
    rasterizes straight to bitmap masks)."""

    def __init__(self, points: np.ndarray, valid: np.ndarray, orig_shape):
        self.points = np.asarray(points, np.float32)
        self.valid = np.asarray(valid, bool)
        self.orig_shape = orig_shape

    def __len__(self):
        return self.points.shape[0]

    @property
    def xy(self):
        return [p[v] for p, v in zip(self.points, self.valid)]


class Probs:
    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data, np.float32)

    @property
    def top1(self):
        return int(self.data.argmax())

    @property
    def top5(self):
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top1conf(self):
        return float(self.data.max())


def contours_to_masks_host(points: np.ndarray, valid: np.ndarray, height: int, width: int):
    """Host-side polygon fill: (n, V, 2) px contours + validity -> (n, H, W)
    bool masks. Semantics match ``ops.raster.fill_polygons`` (invalid
    vertices collapse onto the previous valid one == dropping them), via
    cv2.fillPoly with 3-bit fixed-point subpixel vertices. Exists so lazy
    ``Results.masks`` costs ~1 ms on the host instead of a device dispatch
    per request — on tunneled-TPU deployments one extra dispatch is a full
    link round-trip, which dominated the serving engine's latency
    (runs/serve_bench.json r4 first measure)."""
    n = points.shape[0]
    out = np.zeros((n, height, width), bool)
    try:
        import cv2
    except ImportError:  # parity fallback: the device rasterizer
        import jax.numpy as jnp

        from ..ops.raster import fill_polygons

        return np.asarray(fill_polygons(jnp.asarray(points), jnp.asarray(valid), height, width))
    shift = 3
    for i in range(n):
        pts = points[i][valid[i].astype(bool)]
        if pts.shape[0] >= 3:
            buf = np.zeros((height, width), np.uint8)
            cv2.fillPoly(buf, [np.round(pts * (1 << shift)).astype(np.int32)], 1, shift=shift)
            out[i] = buf.astype(bool)
    return out


class Results:
    """One image's results: boxes / masks / contours / probs + plotting.

    ``lazy_masks=True`` (the polar predictor default) defers contour
    rasterization until ``.masks`` is first read: the polar head's native
    output is the 36-ray contour, and most consumers (plotting, save_txt,
    tracking) never need the bitmap."""

    def __init__(
        self,
        orig_img: np.ndarray,
        path: str,
        names: Dict[int, str],
        boxes: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,
        contours=None,
        probs: Optional[np.ndarray] = None,
        keypoints: Optional[np.ndarray] = None,
        speed: Optional[Dict[str, float]] = None,
        lazy_masks: bool = False,
    ):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self._masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.contours = (
            Contours(contours[0], contours[1], self.orig_shape) if contours is not None else None
        )
        self._lazy_masks = bool(lazy_masks)
        self.probs = Probs(probs) if probs is not None else None
        self.keypoints = keypoints
        self.speed = speed or {}

    @property
    def masks(self) -> Optional[Masks]:
        if self._masks is None and self._lazy_masks and self.contours is not None:
            self._masks = Masks(
                contours_to_masks_host(
                    self.contours.points, self.contours.valid, *self.orig_shape
                ),
                self.orig_shape,
            )
        return self._masks

    @masks.setter
    def masks(self, value):
        if value is not None and not isinstance(value, Masks):
            value = Masks(value, self.orig_shape)
        self._masks = value

    def __len__(self):
        for v in (self.boxes, self._masks, self.contours):
            if v is not None:
                return len(v)
        return 0

    # -- torch-API compatibility (reference results.py:128-161): arrays are
    # already host numpy, so device moves are identity -------------------------
    def cpu(self):
        return self

    def numpy(self):
        return self

    def to(self, *args, **kwargs):
        return self

    def new(self):
        """Empty copy carrying image/path/names (reference results.py:156)."""
        return Results(self.orig_img, self.path, self.names)

    @property
    def keys(self):
        # masks count as present when lazily derivable, without forcing the
        # rasterization
        have_masks = self._masks is not None or (
            self._lazy_masks and self.contours is not None
        )
        return [
            k for k in ("boxes", "masks", "contours", "probs", "keypoints")
            if (have_masks if k == "masks" else getattr(self, k) is not None)
        ]

    def __getitem__(self, idx):
        """Index detections (reference results.py:106).

        Integer indices keep the leading instance axis (reference keeps
        ``(1, ...)`` shapes): ``r[0].masks.data`` is ``(1, H, W)``, not
        ``(H, W)`` — ``np.atleast_3d`` would append the new axis LAST.
        """
        r = self.new()
        is_int = isinstance(idx, (int, np.integer))

        def _keepdim(a):
            a = np.asarray(a)[idx]
            return a[None] if is_int else a

        if self.boxes is not None:
            r.boxes = Boxes(self.boxes.data[idx].reshape(-1, self.boxes.data.shape[-1]),
                            self.orig_shape)
        r._lazy_masks = self._lazy_masks  # slicing must not force rasterization
        if self._masks is not None:
            r.masks = Masks(_keepdim(self._masks.data), self.orig_shape)
        if self.contours is not None:
            r.contours = Contours(
                _keepdim(self.contours.points), _keepdim(self.contours.valid),
                self.orig_shape,
            )
        if self.keypoints is not None:
            r.keypoints = _keepdim(self.keypoints)
        return r

    def update(self, boxes=None, masks=None, probs=None):
        """(reference results.py:118)."""
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        if masks is not None:
            self.masks = Masks(masks, self.orig_shape)
        if probs is not None:
            self.probs = Probs(probs)

    def verbose(self) -> str:
        """'4 persons, 1 dog, ' summary line (reference results.py:273)."""
        if self.probs is not None:
            return f"{self.names.get(self.probs.top1, self.probs.top1)} " \
                   f"{self.probs.top1conf:.2f}, "
        if self.boxes is None or len(self.boxes) == 0:
            return "(no detections), "
        cls = self.boxes.cls.astype(int)
        parts = []
        for c in sorted(set(cls.tolist())):
            n = int((cls == c).sum())
            name = self.names.get(c, str(c))
            parts.append(f"{n} {name}{'s' * (n > 1)}")
        return ", ".join(parts) + ", "

    def tojson(self, normalize: bool = False) -> str:
        """JSON rows with name/class/confidence/box (+segments/keypoints)
        (reference results.py:345)."""
        import json

        h, w = self.orig_shape
        sx, sy = (w, h) if normalize else (1, 1)
        rows = []
        if self.probs is not None:
            rows.append({
                "name": self.names.get(self.probs.top1, str(self.probs.top1)),
                "class": int(self.probs.top1),
                "confidence": round(self.probs.top1conf, 5),
            })
        elif self.boxes is not None:
            for i, row in enumerate(self.boxes.data):
                x1, y1, x2, y2 = (float(v) for v in row[:4])
                item = {
                    "name": self.names.get(int(row[5]), str(int(row[5]))),
                    "class": int(row[5]),
                    "confidence": round(float(row[4]), 5),
                    "box": {"x1": round(x1 / sx, 5), "y1": round(y1 / sy, 5),
                            "x2": round(x2 / sx, 5), "y2": round(y2 / sy, 5)},
                }
                if self.contours is not None and i < len(self.contours):
                    pts = self.contours.xy[i]
                    item["segments"] = {
                        "x": [round(float(x) / sx, 5) for x in pts[:, 0]],
                        "y": [round(float(y) / sy, 5) for y in pts[:, 1]],
                    }
                if self.keypoints is not None:
                    k = np.asarray(self.keypoints[i], np.float64)
                    item["keypoints"] = {
                        "x": [round(float(x) / sx, 5) for x in k[:, 0]],
                        "y": [round(float(y) / sy, 5) for y in k[:, 1]],
                    }
                rows.append(item)
        return json.dumps(rows, indent=2)

    def plot(self, line_width: Optional[int] = None, labels: bool = True, conf: bool = True):
        """Draw boxes/contours onto a copy of the original image."""
        import cv2

        img = self.orig_img.copy()
        lw = line_width or max(round(sum(img.shape) / 2 * 0.003), 2)
        rng = np.random.default_rng(7)
        colors = {i: tuple(int(c) for c in rng.integers(64, 255, 3)) for i in self.names}
        if self.contours is not None:
            for i, pts in enumerate(self.contours.xy):
                if pts.shape[0] >= 3:
                    c = colors.get(int(self.boxes.cls[i]) if self.boxes else 0, (0, 255, 0))
                    cv2.polylines(img, [pts.astype(np.int32)], True, c, lw)
        if self.boxes is not None:
            for row in self.boxes.data:
                x1, y1, x2, y2, cf, cl = row
                c = colors.get(int(cl), (0, 255, 0))
                cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), c, lw)
                if labels:
                    txt = self.names.get(int(cl), str(int(cl)))
                    if conf:
                        txt += f" {cf:.2f}"
                    cv2.putText(img, txt, (int(x1), max(int(y1) - 3, 10)),
                                cv2.FONT_HERSHEY_SIMPLEX, lw / 6, c, max(lw // 2, 1))
        return img

    def save(self, filename: str):
        import cv2

        cv2.imwrite(filename, self.plot())
        return filename

    def save_txt(self, txt_file: str, save_conf: bool = False):
        """YOLO-format results txt (reference results.py:302 save_txt):
        `cls xywhn [conf]` per detection, polygon rows for contours."""
        lines = []
        if self.probs is not None:
            lines.append(f"{self.probs.top1conf:.2f} {self.probs.top1}")
        elif self.boxes is not None:
            for i, row in enumerate(self.boxes.data):
                cls = int(row[5])
                if self.contours is not None and i < len(self.contours):
                    pts = self.contours.xy[i]
                    if pts.shape[0] >= 3:
                        h, w = self.orig_shape
                        seg = " ".join(f"{x / w:.6f} {y / h:.6f}" for x, y in pts)
                        line = f"{cls} {seg}"
                    else:
                        continue
                else:
                    xywhn = self.boxes.xywhn[i]
                    line = f"{cls} " + " ".join(f"{v:.6f}" for v in xywhn)
                if save_conf:
                    line += f" {row[4]:.6f}"
                lines.append(line)
        from pathlib import Path

        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))
        return txt_file

    def save_crop(self, save_dir, file_name: str = "crop"):
        """Save per-detection crops (reference results.py:341 save_crop)."""
        import cv2
        from pathlib import Path

        save_dir = Path(save_dir)
        out = []
        if self.boxes is not None:
            for i, row in enumerate(self.boxes.data):
                x1, y1, x2, y2 = (int(v) for v in row[:4])
                name = self.names.get(int(row[5]), str(int(row[5])))
                d = save_dir / name
                d.mkdir(parents=True, exist_ok=True)
                crop = self.orig_img[max(y1, 0) : y2, max(x1, 0) : x2]
                if crop.size:
                    p = str(d / f"{file_name}_{i}.jpg")
                    cv2.imwrite(p, crop)
                    out.append(p)
        return out
