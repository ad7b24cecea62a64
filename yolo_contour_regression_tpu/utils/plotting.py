"""Plotting — annotator, batch mosaics, training curves, label stats.

Re-implementation of the reference ``utils/plotting.py``: ``Annotator`` (:61,
cv2 box/mask/contour drawing), ``plot_images`` (:367, batch mosaics with
labels), ``plot_results`` (:499, results.csv curves), ``plot_labels`` (:266),
``feature_visualization`` (:573), and ``output_to_target`` (:551, the polar
single-tensor variant). Matplotlib is imported lazily and gated so headless
training never requires it.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np


class Colors:
    """Ultralytics-style color palette (reference plotting.py:25)."""

    def __init__(self):
        hexs = (
            "FF3838", "FF9D97", "FF701F", "FFB21D", "CFD231", "48F90A", "92CC17",
            "3DDB86", "1A9334", "00D4BB", "2C99A8", "00C2FF", "344593", "6473FF",
            "0018EC", "8438FF", "520085", "CB38FF", "FF95C8", "FF37C7",
        )
        self.palette = [tuple(int(h[i : i + 2], 16) for i in (0, 2, 4)) for h in hexs]
        self.n = len(self.palette)

    def __call__(self, i: int, bgr: bool = False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c


colors = Colors()


class Annotator:
    """Box / contour / mask / keypoint / text drawing on one image
    (reference plotting.py:61)."""

    def __init__(self, im: np.ndarray, line_width: Optional[int] = None):
        self.im = np.ascontiguousarray(im)
        self.lw = line_width or max(round(sum(im.shape) / 2 * 0.003), 2)

    def box_label(self, box, label: str = "", color=(128, 128, 128), txt_color=(255, 255, 255)):
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(self.im, p1, p2, color, self.lw, cv2.LINE_AA)
        if label:
            tf = max(self.lw - 1, 1)
            w, h = cv2.getTextSize(label, 0, self.lw / 3, tf)[0]
            outside = p1[1] - h >= 3
            p2t = (p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3)
            cv2.rectangle(self.im, p1, p2t, color, -1, cv2.LINE_AA)
            cv2.putText(
                self.im, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                0, self.lw / 3, txt_color, tf, cv2.LINE_AA,
            )

    def contour(self, points: np.ndarray, color=(0, 255, 0), closed: bool = True):
        """Polar 36-gon outline (no reference equivalent — it only had masks)."""
        if points.shape[0] >= 2:
            cv2.polylines(self.im, [points.astype(np.int32)], closed, color, self.lw, cv2.LINE_AA)

    def masks(self, masks: np.ndarray, mask_colors: List, alpha: float = 0.5):
        """(n, H, W) binary masks alpha-blended."""
        overlay = self.im.astype(np.float32)
        for m, c in zip(masks, mask_colors):
            m3 = m[..., None].astype(np.float32)
            overlay = overlay * (1 - m3 * alpha) + m3 * alpha * np.asarray(c, np.float32)
        self.im = overlay.astype(np.uint8)

    def kpts(self, kpts: np.ndarray, radius: int = 3, conf_thres: float = 0.25):
        for x, y, *v in kpts:
            if not v or v[0] > conf_thres:
                cv2.circle(self.im, (int(x), int(y)), radius, (0, 0, 255), -1, cv2.LINE_AA)

    def text(self, xy, text: str, txt_color=(255, 255, 255)):
        cv2.putText(self.im, text, (int(xy[0]), int(xy[1])), 0, self.lw / 3, txt_color,
                    max(self.lw - 1, 1), cv2.LINE_AA)

    def result(self) -> np.ndarray:
        return self.im


def output_to_target(pred: np.ndarray, max_det: int = 300):
    """Polar eval tensor (B, 4+nc+108, A) -> (N, 6) [bid, cls, xywh, conf]
    rows for plotting (reference plotting.py:551 output_to_target)."""
    out = []
    B, C, A = pred.shape
    nc = C - 4 - 108 if C > 112 else C - 4
    for b in range(B):
        p = pred[b].T  # (A, C)
        scores = p[:, 4 : 4 + nc]
        conf = scores.max(-1)
        cls = scores.argmax(-1)
        keep = np.argsort(-conf)[:max_det]
        xyxy = p[keep, :4]
        xywh = np.concatenate([(xyxy[:, :2] + xyxy[:, 2:]) / 2, xyxy[:, 2:] - xyxy[:, :2]], -1)
        for i, k in enumerate(keep):
            out.append([b, cls[k], *xywh[i], conf[k]])
    return np.asarray(out, np.float32)


def plot_images(
    images: np.ndarray,  # (B, H, W, 3) float 0-1 RGB
    batch: Dict[str, np.ndarray],
    fname: str = "train_batch.jpg",
    names: Optional[Dict[int, str]] = None,
    max_subplots: int = 16,
):
    """Tile a training batch with its GT boxes/contours
    (reference plotting.py:367 plot_images)."""
    B = min(images.shape[0], max_subplots)
    ns = int(np.ceil(B**0.5))
    h, w = images.shape[1:3]
    mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
    for i in range(B):
        r, c = divmod(i, ns)
        im = (images[i, ..., ::-1] * 255).astype(np.uint8)  # RGB->BGR
        ann = Annotator(im.copy())
        if "bboxes" in batch:
            keep = batch["mask_gt"][i]
            xywh = batch["bboxes"][i][keep] * np.asarray([w, h, w, h])
            cls = batch["cls"][i][keep]
            for bx, cl in zip(xywh, cls):
                xyxy = [bx[0] - bx[2] / 2, bx[1] - bx[3] / 2, bx[0] + bx[2] / 2, bx[1] + bx[3] / 2]
                label = names.get(int(cl), str(int(cl))) if names else str(int(cl))
                ann.box_label(xyxy, label, colors(int(cl), True))
            if "segments" in batch:
                for seg, cl in zip(batch["segments"][i][keep], cls):
                    ann.contour(seg * np.asarray([w, h]), colors(int(cl), True))
        mosaic[r * h : (r + 1) * h, c * w : (c + 1) * w] = ann.result()
    Path(fname).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(fname), mosaic)
    return mosaic


def plot_results(csv_file: str = "results.csv", save_path: Optional[str] = None):
    """results.csv -> loss/metric curves png (reference plotting.py:499)."""
    import csv

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    with open(csv_file) as fh:
        rows = list(csv.reader(fh))
    header, data = rows[0], np.asarray([[float(v) for v in r] for r in rows[1:]])
    if data.size == 0:
        return None
    ncols = len(header) - 1
    fig, axes = plt.subplots(
        max((ncols + 3) // 4, 1), min(ncols, 4), figsize=(4 * min(ncols, 4), 3 * max((ncols + 3) // 4, 1)),
        squeeze=False,
    )
    for j in range(ncols):
        ax = axes[j // 4][j % 4]
        ax.plot(data[:, 0], data[:, j + 1], marker=".")
        ax.set_title(header[j + 1], fontsize=8)
    fig.tight_layout()
    out = save_path or str(Path(csv_file).with_name("results.png"))
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_pr_curve(rx: np.ndarray, p_curve: np.ndarray, ap50: np.ndarray,
                  save_path, names=None, classes=None):
    """Per-class + mean PR curves at IoU 0.5 (reference plotting of
    ap_per_class, metrics.py:336 plot_pr_curve)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    fig, ax = plt.subplots(figsize=(6, 5))
    names = names or {}
    for ci in range(p_curve.shape[0]):
        c = int(classes[ci]) if classes is not None else ci
        label = f"{names.get(c, c)} {ap50[ci]:.3f}" if p_curve.shape[0] <= 20 else None
        ax.plot(rx, p_curve[ci], lw=1, alpha=0.6, label=label)
    ax.plot(rx, p_curve.mean(0), lw=2.5, color="blue",
            label=f"all classes {ap50.mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.02)
    ax.legend(fontsize=7, loc="lower left")
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return str(save_path)


def plot_confusion_matrix(matrix: np.ndarray, names, save_path, normalize: bool = True):
    """Confusion-matrix heatmap (reference metrics.py:336 ConfusionMatrix.plot)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    m = matrix.astype(np.float64)
    if normalize:
        m = m / (m.sum(0, keepdims=True) + 1e-9)
    nc1 = m.shape[0]
    labels = [str(names.get(i, i)) for i in range(nc1 - 1)] + ["background"]
    fig, ax = plt.subplots(figsize=(max(6, nc1 * 0.5), max(5, nc1 * 0.45)))
    im = ax.imshow(m, cmap="Blues", vmin=0.0)
    fig.colorbar(im, ax=ax, fraction=0.046)
    ax.set_xticks(range(nc1))
    ax.set_yticks(range(nc1))
    ax.set_xticklabels(labels, rotation=90, fontsize=7)
    ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    if nc1 <= 30:  # annotate cells when readable
        for i in range(nc1):
            for j in range(nc1):
                v = m[i, j]
                if v > 0:
                    ax.text(j, i, f"{v:.2f}" if normalize else f"{int(v)}",
                            ha="center", va="center", fontsize=6,
                            color="white" if v > m.max() * 0.6 else "black")
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return str(save_path)


def plot_labels(cls: np.ndarray, bboxes_xywh: np.ndarray, names=None, save_dir: Path = Path(".")):
    """Label distribution plots (reference plotting.py:266)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].hist(cls, bins=max(int(cls.max()) + 1 if cls.size else 1, 1))
    axes[0].set_title("classes")
    if bboxes_xywh.size:
        axes[1].scatter(bboxes_xywh[:, 0], bboxes_xywh[:, 1], s=2, alpha=0.4)
        axes[1].set_title("xy centers")
        axes[2].scatter(bboxes_xywh[:, 2], bboxes_xywh[:, 3], s=2, alpha=0.4)
        axes[2].set_title("wh")
    out = Path(save_dir) / "labels.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return str(out)


def feature_visualization(x: np.ndarray, module_name: str, save_dir: Path = Path("."), n: int = 32):
    """Per-channel feature-map grid (reference plotting.py:573). x NHWC."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    ch = min(x.shape[-1], n)
    cols = 8
    rows = int(np.ceil(ch / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols, rows), squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < ch:
            ax.imshow(x[0, :, :, i], cmap="viridis")
    out = Path(save_dir) / f"features_{module_name}.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return str(out)
