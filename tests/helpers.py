"""Shared test utilities: synthetic YOLO-format shape datasets."""
import math
import random
from pathlib import Path

import cv2
import numpy as np


def make_shape_dataset(root: Path, n_train=8, n_val=4, imgsz=96, nc=2, seed=0, img_w=None):
    """Images with filled circles/rectangles + YOLO polygon labels.

    class 0 = circle, class 1 = rectangle. ``img_w`` makes rectangular
    (imgsz x img_w) images to exercise native-space / non-square eval.
    Returns dataset yaml path."""
    rng = random.Random(seed)
    img_w = img_w or imgsz
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = np.full((imgsz, img_w, 3), 40, np.uint8)
            lines = []
            for _ in range(rng.randint(1, 3)):
                cls = rng.randrange(nc)
                cx, cy = rng.uniform(0.3, 0.7) * img_w, rng.uniform(0.3, 0.7) * imgsz
                r = rng.uniform(0.08, 0.2) * imgsz
                color = tuple(rng.randint(100, 255) for _ in range(3))
                if cls == 0:
                    pts = [
                        (cx + r * math.cos(t), cy + r * math.sin(t))
                        for t in np.linspace(0, 2 * math.pi, 24, endpoint=False)
                    ]
                else:
                    pts = [(cx - r, cy - r), (cx + r, cy - r), (cx + r, cy + r), (cx - r, cy + r)]
                cv2.fillPoly(img, [np.asarray(pts, np.int32)], color)
                poly = " ".join(f"{x / img_w:.5f} {y / imgsz:.5f}" for x, y in pts)
                lines.append(f"{cls} {poly}")
            cv2.imwrite(str(root / "images" / split / f"{i:04d}.jpg"), img)
            (root / "labels" / split / f"{i:04d}.txt").write_text("\n".join(lines))
    yaml_path = root / "data.yaml"
    yaml_path.write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\n"
        f"names:\n  0: circle\n  1: rect\n"
    )
    return yaml_path


def make_pose_dataset(root: Path, n_train=8, n_val=4, imgsz=96, seed=0):
    """Circles with 5 keypoints (center + 4 cardinal edge points), one class.

    Keypoints are drawn as distinct colored dots so their locations are
    learnable from pixels. YOLO pose label format:
    ``cls cx cy w h (x y v) * 5`` normalized; kpt_shape [5, 3]."""
    rng = random.Random(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = np.full((imgsz, imgsz, 3), 40, np.uint8)
            lines = []
            for _ in range(rng.randint(1, 2)):
                cx = rng.uniform(0.3, 0.7) * imgsz
                cy = rng.uniform(0.3, 0.7) * imgsz
                r = rng.uniform(0.12, 0.22) * imgsz
                cv2.circle(img, (int(cx), int(cy)), int(r), (160, 160, 160), -1)
                kpts = [
                    (cx, cy, (0, 0, 255)),       # center: red
                    (cx + r, cy, (0, 255, 0)),   # right: green
                    (cx, cy + r, (255, 0, 0)),   # bottom: blue
                    (cx - r, cy, (0, 255, 255)), # left: yellow
                    (cx, cy - r, (255, 0, 255)), # top: magenta
                ]
                for kx, ky, color in kpts:
                    cv2.circle(img, (int(kx), int(ky)), max(2, int(r * 0.15)), color, -1)
                box = f"{cx / imgsz:.5f} {cy / imgsz:.5f} {2 * r / imgsz:.5f} {2 * r / imgsz:.5f}"
                kp = " ".join(
                    f"{kx / imgsz:.5f} {ky / imgsz:.5f} 2" for kx, ky, _ in kpts
                )
                lines.append(f"0 {box} {kp}")
            cv2.imwrite(str(root / "images" / split / f"{i:04d}.jpg"), img)
            (root / "labels" / split / f"{i:04d}.txt").write_text("\n".join(lines))
    yaml_path = root / "data.yaml"
    yaml_path.write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\n"
        f"kpt_shape: [5, 3]\nflip_idx: [0, 3, 2, 1, 4]\nnames:\n  0: circle\n"
    )
    return yaml_path


def make_cls_dataset(root: Path, n_train=16, n_val=8, imgsz=64, seed=0):
    """Imagefolder classification dataset: root/{train,val}/{circle,rect}/."""
    rng = random.Random(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        for cls_name in ("circle", "rect"):
            (root / split / cls_name).mkdir(parents=True, exist_ok=True)
            for i in range(n):
                img = np.full((imgsz, imgsz, 3), 40, np.uint8)
                cx = int(rng.uniform(0.35, 0.65) * imgsz)
                cy = int(rng.uniform(0.35, 0.65) * imgsz)
                r = int(rng.uniform(0.15, 0.3) * imgsz)
                color = tuple(rng.randint(100, 255) for _ in range(3))
                if cls_name == "circle":
                    cv2.circle(img, (cx, cy), r, color, -1)
                else:
                    cv2.rectangle(img, (cx - r, cy - r), (cx + r, cy + r), color, -1)
                cv2.imwrite(str(root / split / cls_name / f"{i:04d}.jpg"), img)
    return root
