"""Split an images+labels dir into train/val/test (reference split.py)."""
import random
import shutil
import sys
from pathlib import Path


def split(root, ratios=(0.8, 0.1, 0.1), seed=0):
    root = Path(root)
    imgs = sorted((root / "images").glob("*"))
    random.Random(seed).shuffle(imgs)
    n = len(imgs)
    cuts = [int(n * ratios[0]), int(n * (ratios[0] + ratios[1]))]
    splits = {"train": imgs[: cuts[0]], "val": imgs[cuts[0] : cuts[1]], "test": imgs[cuts[1] :]}
    for name, files in splits.items():
        (root / "images" / name).mkdir(parents=True, exist_ok=True)
        (root / "labels" / name).mkdir(parents=True, exist_ok=True)
        for f in files:
            shutil.move(str(f), root / "images" / name / f.name)
            lbl = root / "labels" / (f.stem + ".txt")
            if lbl.exists():
                shutil.move(str(lbl), root / "labels" / name / lbl.name)
    print({k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    split(sys.argv[1] if len(sys.argv) > 1 else ".")
