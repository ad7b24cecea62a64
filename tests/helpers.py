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
