#!/usr/bin/env python
"""Offline .pt -> native .ckpt conversion (the recipe models/nas/model.py and
the exporter's OFFLINE_RECIPES point at). Run where torch can unpickle the
source checkpoint; the output loads with ``YOLO(out.ckpt)``.

Usage:
    python examples/scripts/convert_torch_ckpt.py weights.pt model.yaml \
        [--out weights.ckpt] [--nc N] [--imgsz 640] [--strict]

The yaml must describe the same architecture the .pt was trained with
(reference nn/tasks.py:553 torch_safe_load loads arch + weights from the
pickle; this repo keeps architecture in yaml and weights in .ckpt instead).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("pt_path", help="source torch checkpoint (.pt/.pth)")
    ap.add_argument("model_yaml", help="architecture yaml matching the .pt")
    ap.add_argument("--out", default=None, help="output .ckpt path")
    ap.add_argument("--nc", type=int, default=None, help="class count override")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--strict", action="store_true",
                    help="fail on any unconverted tensor")
    args = ap.parse_args()

    from yolo_contour_regression_tpu.utils.torch_convert import (
        convert_torch_checkpoint,
    )

    out = convert_torch_checkpoint(
        args.pt_path, args.model_yaml, out_path=args.out,
        nc=args.nc, imgsz=args.imgsz, strict=args.strict,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
