"""CLI entrypoint (reference tests/test_cli.py): real subprocess runs of
``python -m yolo_contour_regression_tpu TASK MODE k=v``."""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


def _run(args, timeout=900):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(ROOT)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "yolo_contour_regression_tpu", *args],
        capture_output=True, text=True, timeout=timeout, cwd=str(ROOT), env=env,
    )


def test_cli_help():
    r = _run(["help"], timeout=120)
    assert r.returncode == 0
    assert "usage: yolo" in r.stdout


def test_cli_rejects_bad_mode():
    r = _run(["segment", "fly"], timeout=120)
    assert r.returncode != 0


@pytest.mark.slow
def test_cli_train_val_predict(tmp_path):
    from tests.helpers import make_shape_dataset

    yaml_path = make_shape_dataset(tmp_path / "ds", n_train=4, n_val=2, imgsz=48)
    r = _run([
        "segment", "train", "model=yolov8n-seg.yaml", f"data={yaml_path}",
        "epochs=1", "imgsz=64", "batch=2", "workers=1",
        f"project={tmp_path / 'runs'}", "name=cli", "plots=False",
    ], timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    best = tmp_path / "runs" / "cli" / "weights" / "last.ckpt"
    assert best.exists()

    img = tmp_path / "ds" / "images" / "val" / "0000.jpg"
    r = _run([
        "segment", "predict", f"model={best}", f"source={img}",
        "imgsz=64", "conf=0.001", f"project={tmp_path / 'runs'}",
    ], timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
