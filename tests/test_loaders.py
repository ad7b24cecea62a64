"""Inference source loaders (reference data/loaders.py): files, dirs, arrays,
videos, and the mss-gated screenshot stream (driven with a fake mss)."""
import itertools
import sys
import types

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from yolo_contour_regression_tpu.engine.predictor import iter_source  # noqa: E402


def _img(tmp_path, name, size=32):
    p = tmp_path / name
    cv2.imwrite(str(p), np.full((size, size, 3), 128, np.uint8))
    return p


def test_iter_array_and_list(tmp_path):
    a = np.zeros((16, 16, 3), np.uint8)
    assert [n for n, _ in iter_source(a)] == ["array"]
    f = _img(tmp_path, "x.jpg")
    out = list(iter_source([a, str(f)]))
    assert out[0][0] == "array0" and out[1][0] == str(f)


def test_iter_dir_recursive(tmp_path):
    _img(tmp_path, "a.jpg")
    (tmp_path / "sub").mkdir()
    _img(tmp_path / "sub", "b.png")
    (tmp_path / "notes.txt").write_text("skip me")
    names = [n for n, _ in iter_source(str(tmp_path))]
    assert len(names) == 2 and names == sorted(names)


def test_iter_video(tmp_path):
    p = tmp_path / "v.avi"
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"MJPG"), 5, (32, 32))
    for _ in range(3):
        w.write(np.full((32, 32, 3), 64, np.uint8))
    w.release()
    frames = list(iter_source(str(p)))
    assert len(frames) == 3
    assert frames[0][0].endswith("#frame0") and frames[0][1].shape == (32, 32, 3)


def test_iter_screenshots_fake_mss(monkeypatch):
    """screen source: monitor select + LTWH region crop, BGRA->BGR, endless
    stream (reference LoadScreenshots semantics)."""
    grabs = []

    class Sct:
        monitors = [
            {"left": 0, "top": 0, "width": 800, "height": 600},
            {"left": 800, "top": 0, "width": 1024, "height": 768},
        ]

        def grab(self, region):
            grabs.append(dict(region))
            return np.zeros((region["height"], region["width"], 4), np.uint8)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake = types.ModuleType("mss")
    fake.mss = Sct
    monkeypatch.setitem(sys.modules, "mss", fake)

    out = list(itertools.islice(iter_source("screen 1 10 20 100 50"), 2))
    assert [n for n, _ in out] == ["screen1#frame0", "screen1#frame1"]
    assert out[0][1].shape == (50, 100, 3)  # region HxW, BGR
    assert grabs[0] == {"left": 810, "top": 20, "width": 100, "height": 50}

    grabs.clear()
    frame_name, frame = next(iter(iter_source("screen")))
    assert frame_name == "screen0#frame0" and frame.shape == (600, 800, 3)
