"""HSV-V brightness day/night triage of an image folder (reference day_night.py)."""
import sys
from pathlib import Path

import cv2
import numpy as np


def classify_folder(root, thresh=60.0):
    for f in sorted(Path(root).glob("*")):
        if f.suffix.lower() not in (".jpg", ".jpeg", ".png", ".bmp"):
            continue
        img = cv2.imread(str(f))
        v = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)[..., 2].mean()
        print(f.name, "day" if v > thresh else "night", f"v={v:.1f}")


if __name__ == "__main__":
    classify_folder(sys.argv[1] if len(sys.argv) > 1 else ".")
