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


def test_cli_special_commands(tmp_path, monkeypatch, capsys):
    """Reference CLI special commands (cfg/__init__.py:315): version, checks,
    settings [reset], cfg, copy-cfg, hub login/logout — all exit 0.

    Settings and hub state are redirected to tmp_path: the reset/logout
    commands must never touch the developer's real config as a side effect."""
    from yolo_contour_regression_tpu import __version__
    from yolo_contour_regression_tpu.cfg import entrypoint
    from yolo_contour_regression_tpu.hub import session as hub_session
    from yolo_contour_regression_tpu.utils import settings as settings_mod

    monkeypatch.setattr(settings_mod, "SETTINGS_PATH", tmp_path / "settings.json")
    monkeypatch.setattr(settings_mod, "SETTINGS", None)
    monkeypatch.setattr(hub_session, "HUB_DIR", tmp_path / "hub")

    assert entrypoint(["version"]) == 0
    assert __version__ in capsys.readouterr().out

    assert entrypoint(["--version"]) == 0  # lenient spelling
    capsys.readouterr()

    assert entrypoint(["checks"]) == 0

    assert entrypoint(["settings"]) == 0
    assert "=" in capsys.readouterr().out

    assert entrypoint(["settings", "reset"]) == 0
    assert "reset" in capsys.readouterr().out

    assert entrypoint(["cfg"]) == 0
    assert "imgsz" in capsys.readouterr().out

    monkeypatch.chdir(tmp_path)
    assert entrypoint(["copy-cfg"]) == 0
    assert (tmp_path / "default_copy.yaml").exists()

    assert entrypoint(["hub", "login", "testkey"]) == 0
    assert entrypoint(["hub", "logout"]) == 0
    assert entrypoint(["logout"]) == 0
