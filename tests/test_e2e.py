"""End-to-end smoke tests through the YOLO facade (reference test strategy:
tests/test_python.py — train/val/predict 1-epoch runs on tiny data)."""
from pathlib import Path

import numpy as np
import pytest

from tests.helpers import make_shape_dataset


@pytest.fixture(scope="module")
def ds_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    return make_shape_dataset(root / "ds", n_train=8, n_val=4, imgsz=96)


@pytest.mark.slow
def test_train_val_predict_segment(ds_yaml, tmp_path):
    from yolo_contour_regression_tpu import YOLO

    m = YOLO("yolov8n-seg.yaml")
    metrics = m.train(
        data=str(ds_yaml), epochs=2, imgsz=64, batch=4, workers=2,
        project=str(tmp_path / "runs"), warmup_epochs=0.0, val=True,
        max_instances=8, cand_per_gt=32, patience=10, close_mosaic=0,
        plots=True,
    )
    assert "metrics/mAP50-95(M)" in metrics
    # pre-train label-distribution plot (reference trainer plot_training_labels)
    assert (m.trainer.save_dir / "labels.png").exists()
    # checkpoints written
    wdir = m.trainer.wdir
    assert (wdir / "last.ckpt").exists() and (wdir / "best.ckpt").exists()
    # results csv has 2 epochs
    lines = (m.trainer.save_dir / "results.csv").read_text().strip().splitlines()
    assert len(lines) == 3

    # predict on a val image via the facade (weights adopted from best.ckpt)
    img_dir = Path(str(ds_yaml)).parent / "images/val"
    res = m.predict(str(next(img_dir.glob("*.jpg"))))
    assert len(res) == 1
    r = res[0]
    assert r.boxes is not None and r.contours is not None
    plotted = r.plot()
    assert plotted.shape == r.orig_img.shape

    # standalone val from the trained handle
    v = m.val(data=str(ds_yaml), imgsz=64, batch=4, max_instances=8)
    assert np.isfinite(v["fitness"])


@pytest.mark.slow
def test_resume_training(ds_yaml, tmp_path):
    from yolo_contour_regression_tpu import YOLO

    m = YOLO("yolov8n-seg.yaml")
    m.train(
        data=str(ds_yaml), epochs=1, imgsz=64, batch=4, workers=2,
        project=str(tmp_path / "runs"), name="resume_run", warmup_epochs=0.0,
        val=False, max_instances=8, cand_per_gt=32, close_mosaic=0,
    )
    last = m.trainer.wdir / "last.ckpt"
    m2 = YOLO("yolov8n-seg.yaml")
    m2.train(
        data=str(ds_yaml), epochs=2, imgsz=64, batch=4, workers=2,
        project=str(tmp_path / "runs"), name="resume_run", warmup_epochs=0.0,
        val=False, max_instances=8, cand_per_gt=32, close_mosaic=0,
        resume=str(last),
    )
    assert m2.trainer.start_epoch == 1


@pytest.mark.slow
def test_checkpoint_load_predict(ds_yaml, tmp_path):
    from yolo_contour_regression_tpu import YOLO

    m = YOLO("yolov8n-seg.yaml")
    m.train(
        data=str(ds_yaml), epochs=1, imgsz=64, batch=4, workers=2,
        project=str(tmp_path / "runs"), warmup_epochs=0.0, val=False,
        max_instances=8, cand_per_gt=32, close_mosaic=0,
    )
    ckpt = m.trainer.wdir / "last.ckpt"
    m2 = YOLO(str(ckpt))
    assert m2.task == "segment"
    img = np.full((96, 96, 3), 128, np.uint8)
    res = m2.predict(img, imgsz=64)
    assert len(res) == 1


@pytest.mark.slow
def test_train_pose_device_augment(tmp_path):
    """Pose training through the device-augmentation path: keypoints warp
    with the fused mosaic/affine gather, flip_idx applies on fliplr."""
    from tests.helpers import make_pose_dataset
    from yolo_contour_regression_tpu import YOLO

    yp = make_pose_dataset(tmp_path / "ds", n_train=8, n_val=4, imgsz=96)
    m = YOLO("yolov8n-pose.yaml")
    metrics = m.train(
        data=str(yp), epochs=1, imgsz=64, batch=4, workers=2,
        project=str(tmp_path / "runs"), warmup_epochs=0.0, val=True,
        max_instances=8, patience=10, close_mosaic=0, fliplr=1.0,
    )
    assert "metrics/mAP50-95(B)" in metrics
    import numpy as np
    assert np.isfinite(metrics.get("fitness", np.nan))
