"""Cross-format benchmark() table + ProfileModels equivalent
(reference utils/benchmarks.py:47,150)."""
from pathlib import Path

import numpy as np
import pytest


@pytest.mark.heavy
def test_benchmark_table_native_and_stablehlo(tmp_path):
    from yolo_contour_regression_tpu import YOLO
    from yolo_contour_regression_tpu.utils.benchmarks import benchmark

    m = YOLO("yolov8n-seg.yaml")
    rows = benchmark(
        m, imgsz=64, batch=2, formats=["native", "fused", "int8", "stablehlo"],
        project=str(tmp_path), verbose=False,
    )
    assert [r["format"] for r in rows] == ["native", "fused", "int8", "stablehlo"]
    for r in rows:
        assert r["status"] == "ok", r
    assert all(rows[i]["imgs_per_sec"] > 0 for i in (0, 1, 2))
    # exported artifact reproduces the fused prediction
    assert rows[3]["consistency_maxabs"] < 1e-3


@pytest.mark.slow
def test_benchmark_val_and_tf_formats(tmp_path):
    from tests.helpers import make_shape_dataset
    from yolo_contour_regression_tpu import YOLO
    from yolo_contour_regression_tpu.utils.benchmarks import benchmark

    yaml_path = make_shape_dataset(tmp_path / "ds", n_train=2, n_val=2, imgsz=48)
    m = YOLO("yolov8n-seg.yaml")
    rows = benchmark(
        m, data=str(yaml_path), imgsz=64, batch=2,
        formats=["fused", "saved_model", "pb"], project=str(tmp_path), verbose=False,
    )
    by = {r["format"]: r for r in rows}
    assert by["fused"]["status"] == "ok" and "mAP50-95" in by["fused"]
    assert by["saved_model"]["status"] == "ok"
    assert by["saved_model"]["consistency_maxabs"] < 5e-2
    assert by["pb"]["status"] == "ok"
    assert by["pb"]["consistency_maxabs"] < 5e-2


def test_profile_models():
    from yolo_contour_regression_tpu.utils.benchmarks import profile_models

    rows = profile_models(["yolov8n-seg.yaml"], imgsz=64, num_timed_runs=4, verbose=False)
    assert rows[0]["params_M"] > 1 and rows[0]["latency_ms"] > 0
