"""Data pipeline tests: dataset parsing, augmentation geometry, loader."""
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from tests.helpers import make_shape_dataset
from yolo_contour_regression_tpu.data.build import DataLoader
from yolo_contour_regression_tpu.data.dataset import YOLODataset, parse_label_file
from yolo_contour_regression_tpu.data.instance import Instances, resample_segment
from yolo_contour_regression_tpu.data import augment as A

HYP = SimpleNamespace(
    mosaic=1.0, mixup=0.0, degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
    perspective=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, fliplr=0.5, flipud=0.0,
)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    make_shape_dataset(root, n_train=6, n_val=2, imgsz=96)
    return root


def test_parse_label_file(dataset_dir):
    lbl = next((dataset_dir / "labels/train").glob("*.txt"))
    cls, boxes, segs = parse_label_file(str(lbl))
    assert cls.shape[0] >= 1
    assert boxes.shape == (cls.shape[0], 4)
    assert segs.shape == (cls.shape[0], 360, 2)
    assert (boxes >= 0).all() and (boxes <= 1).all()
    # contour encloses the box center
    assert np.isfinite(segs).all()


def test_resample_segment_closed():
    tri = np.array([[0, 0], [10, 0], [5, 10]], np.float32)
    out = resample_segment(tri, 360)
    assert out.shape == (360, 2)
    np.testing.assert_allclose(out[0], [0, 0], atol=1e-4)


def test_dataset_getitem_train_shapes(dataset_dir):
    ds = YOLODataset(
        dataset_dir / "images/train", imgsz=64, augment=True, hyp=HYP,
        max_instances=8, seed=0,
    )
    s = ds[0]
    assert s["img"].shape == (64, 64, 3)
    assert s["img"].dtype == np.float32
    assert 0 <= s["img"].min() and s["img"].max() <= 1
    assert s["cls"].shape == (8,)
    assert s["bboxes"].shape == (8, 4)
    assert s["segments"].shape == (8, 360, 2)
    assert s["mask_gt"].shape == (8,)
    valid = s["mask_gt"]
    if valid.any():
        assert (s["bboxes"][valid] >= 0).all() and (s["bboxes"][valid] <= 1).all()
        # contour stays inside its own bbox (+tolerance)
        seg = s["segments"][valid]
        xywh = s["bboxes"][valid]
        x1 = xywh[:, 0] - xywh[:, 2] / 2 - 0.02
        x2 = xywh[:, 0] + xywh[:, 2] / 2 + 0.02
        assert (seg[..., 0] >= x1[:, None]).all() and (seg[..., 0] <= x2[:, None]).all()


def test_dataset_val_letterbox(dataset_dir):
    ds = YOLODataset(dataset_dir / "images/val", imgsz=64, augment=False, max_instances=8)
    s = ds[0]
    assert s["img"].shape == (64, 64, 3)
    assert s["mask_gt"].any()


def test_instances_flip_consistency():
    inst = Instances(
        np.array([0.0]), np.array([[10, 20, 30, 40]], np.float32),
        np.tile(np.array([[12.0, 25.0]], np.float32), (1, 360, 1)),
    )
    inst.fliplr(100)
    np.testing.assert_allclose(inst.bboxes, [[70, 20, 90, 40]])
    np.testing.assert_allclose(inst.segments[0, 0], [88, 25])


def test_mosaic_and_perspective_bounds(dataset_dir):
    import random

    ds = YOLODataset(dataset_dir / "images/train", imgsz=64, augment=False, max_instances=8)
    rng = random.Random(0)
    s = A.mosaic4([ds.load_raw(i % len(ds)) for i in range(4)], 64, rng)
    assert s.img.shape == (128, 128, 3)
    s = A.random_perspective(s, 64, rng, translate=0.1, scale=0.5, border=(-32, -32))
    assert s.img.shape == (64, 64, 3)
    if len(s.inst):
        assert (s.inst.bboxes[:, [0, 2]] <= 64).all() and (s.inst.bboxes >= 0).all()


def test_loader_finite_pass(dataset_dir):
    ds = YOLODataset(dataset_dir / "images/train", imgsz=64, augment=False, max_instances=8)
    loader = DataLoader(ds, batch_size=2, shuffle=False, infinite=False, workers=3, drop_last=False)
    batches = list(loader)
    assert sum(b["img"].shape[0] for b in batches) == len(ds)
    assert batches[0]["img"].shape == (2, 64, 64, 3)


def test_loader_infinite_and_sharded(dataset_dir):
    ds = YOLODataset(dataset_dir / "images/train", imgsz=64, augment=False, max_instances=8)
    loader = DataLoader(
        ds, batch_size=2, shuffle=True, infinite=True, workers=2,
        process_index=0, process_count=2,
    )
    it = iter(loader)
    seen = [next(it) for _ in range(4)]  # crosses an epoch boundary (3 imgs/host)
    assert all(b["img"].shape == (2, 64, 64, 3) for b in seen)


def test_pose_keypoint_labels(tmp_path):
    """Pose-format label parsing + keypoint geometry through the pipeline."""
    import cv2

    from yolo_contour_regression_tpu.data.dataset import YOLODataset

    (tmp_path / "images/train").mkdir(parents=True)
    (tmp_path / "labels/train").mkdir(parents=True)
    img = np.full((64, 64, 3), 90, np.uint8)
    cv2.imwrite(str(tmp_path / "images/train/0.jpg"), img)
    # box + 3 keypoints with visibility
    kpts = "0.4 0.4 2 0.5 0.5 2 0.6 0.6 1"
    (tmp_path / "labels/train/0.txt").write_text(f"0 0.5 0.5 0.4 0.4 {kpts}\n")
    ds = YOLODataset(
        tmp_path / "images/train", imgsz=64, augment=False, max_instances=4,
        kpt_shape=(3, 3), cache=False,
    )
    s = ds[0]
    assert "keypoints" in s and s["keypoints"].shape == (4, 3, 3)
    k = s["keypoints"][0]
    assert abs(k[1, 0] - 0.5) < 0.05 and abs(k[1, 1] - 0.5) < 0.05
    assert k[0, 2] == 2 and k[2, 2] == 1

    # fliplr mirrors x
    from yolo_contour_regression_tpu.data.instance import Instances

    inst = Instances(
        np.zeros(1), np.array([[10, 10, 30, 30]], np.float32),
        np.zeros((1, 360, 2), np.float32),
        np.array([[[20.0, 20.0, 2.0]]], np.float32),
    )
    inst.fliplr(64)
    np.testing.assert_allclose(inst.keypoints[0, 0], [44, 20, 2])


def test_image_cache_ram_and_disk(tmp_path):
    """cache=ram/disk return identical samples to the uncached path."""
    from tests.helpers import make_shape_dataset
    from yolo_contour_regression_tpu.data.dataset import YOLODataset

    make_shape_dataset(tmp_path, n_train=3, n_val=1, imgsz=32)
    root = str(tmp_path / "images" / "train")
    base = YOLODataset(root, imgsz=32, augment=False)
    ram = YOLODataset(root, imgsz=32, augment=False, cache_images="ram")
    disk = YOLODataset(root, imgsz=32, augment=False, cache_images="disk")
    for i in range(3):
        want = base[i]["img"]
        np.testing.assert_array_equal(ram[i]["img"], want)
        np.testing.assert_array_equal(ram[i]["img"], want)  # cache hit
        np.testing.assert_array_equal(disk[i]["img"], want)
        np.testing.assert_array_equal(disk[i]["img"], want)  # mmap hit
    assert any((tmp_path / "images" / "train" / ".img_cache").iterdir())


def test_pixel_augment_ops():
    """Native Blur/MedianBlur/ToGray/CLAHE (the reference's active
    Albumentations set) fire per their probabilities and only touch pixels."""
    import random

    from yolo_contour_regression_tpu.data.augment import pixel_augment

    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    # p=0 -> identity
    out = pixel_augment(img.copy(), random.Random(0), p=0.0)
    np.testing.assert_array_equal(out, img)
    # p=1 -> all four fire; shape/dtype preserved, image actually changed
    out = pixel_augment(img.copy(), random.Random(0), p=1.0)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).mean() > 1
    # ToGray leaves channels equal when it is the last-applied color op
    g = pixel_augment(img.copy(), random.Random(1), p=1.0)
    assert g.shape == (32, 32, 3)


def test_autosplit(tmp_path):
    from tests.helpers import make_shape_dataset
    from yolo_contour_regression_tpu.data.utils import autosplit

    make_shape_dataset(tmp_path / "ds", n_train=20, n_val=2, imgsz=32, seed=0)
    files = autosplit(tmp_path / "ds" / "images", weights=(0.8, 0.2, 0.0))
    train = files[0].read_text().splitlines()
    val = files[1].read_text().splitlines()
    assert len(train) + len(val) == 22 and len(train) > len(val)
    assert all(ln.startswith("./images/") for ln in train + val)
    # annotated_only drops images without label files
    (tmp_path / "ds" / "labels" / "train" / "0000.txt").unlink()
    files2 = autosplit(tmp_path / "ds" / "images", weights=(1.0, 0.0, 0.0),
                       annotated_only=True)
    assert len(files2[0].read_text().splitlines()) == 21


def test_hub_dataset_stats(tmp_path):
    from tests.helpers import make_shape_dataset
    from yolo_contour_regression_tpu.data.utils import HUBDatasetStats

    yp = make_shape_dataset(tmp_path / "ds", n_train=6, n_val=3, imgsz=48, seed=0)
    stats = HUBDatasetStats(str(yp), task="segment")
    js = stats.get_json(save=True)
    assert js["nc"] == 2 and js["test"] is None
    assert js["train"]["image_stats"]["total"] == 6
    assert js["val"]["image_stats"]["total"] == 3
    assert js["train"]["instance_stats"]["total"] >= 6
    row = js["train"]["labels"][0]
    first = next(iter(row.values()))[0]
    assert isinstance(first[0], int) and len(first) > 4  # cls + flattened segment
    assert (stats.hub_dir / "stats.json").exists()
    out = stats.process_images()
    assert len(list(out.glob("*"))) == 9


def test_rect_val_batches_and_map_equivalence(tmp_path):
    """Rect validation (reference data/dataset.py:164 + base.py:127
    set_rectangle): aspect-sorted batches letterboxed to per-batch /32
    shapes. mAP must match square val (matching is native-space), with less
    padded area per batch."""
    import numpy as np

    from tests.helpers import make_shape_dataset
    from yolo_contour_regression_tpu.cfg import get_cfg
    from yolo_contour_regression_tpu.data.build import build_dataloader, build_yolo_dataset
    from yolo_contour_regression_tpu.data.utils import check_det_dataset

    # very wide sources (96 x 384, ar 0.25): square val letterboxes to
    # 128x128; rect val picks a much shorter height (64) per the reference's
    # ceil(ar * imgsz/32 + 0.5) * 32 rule
    yp = make_shape_dataset(tmp_path / "ds", n_train=4, n_val=8, imgsz=96,
                            img_w=384, seed=3)
    data = check_det_dataset(str(yp))
    cfg = get_cfg(dict(task="segment", imgsz=128, batch=4, rect=True))
    ds = build_yolo_dataset(cfg, data["val"], 4, data, mode="val")
    assert ds.rect and ds.order is not None
    loader = build_dataloader(ds, 4, 2, shuffle=False, mode="val")
    shapes = set()
    for b in loader:
        h, w = b["img"].shape[1:3]
        shapes.add((h, w))
        assert h % 32 == 0 and w % 32 == 0
    # wide images -> rect height < rect width, and area saved vs 128x128
    assert all(h < w for h, w in shapes), shapes
    assert min(h for h, _ in shapes) < 128
    assert all(h * w < 128 * 160 for h, w in shapes), shapes

    # mAP equivalence on a trained-from-scratch? too slow: use an untrained
    # model only to smoke the full val path with rect batches
    from yolo_contour_regression_tpu.engine.model import YOLO

    m = YOLO("yolov8n-seg.yaml")
    res_rect = m.val(data=str(yp), imgsz=128, batch=4, rect=True,
                     project=str(tmp_path / "runs_rect"))
    res_sq = m.val(data=str(yp), imgsz=128, batch=4, rect=False,
                   project=str(tmp_path / "runs_sq"))
    # untrained model: both near zero, but the pipeline must agree closely
    assert abs(res_rect["metrics/mAP50-95(M)"] - res_sq["metrics/mAP50-95(M)"]) < 0.05


def test_device_pool_loader(dataset_dir):
    """cache='device': the image set is staged on-device once and batches
    gather by index there — 'img' arrives as a committed jax array with the
    same contents the host path would produce for the same index."""
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.cfg import get_cfg
    from yolo_contour_regression_tpu.data.build import (
        DevicePoolLoader, build_dataloader, build_yolo_dataset,
    )
    from yolo_contour_regression_tpu.data.utils import check_det_dataset

    data = check_det_dataset(str(dataset_dir / "data.yaml"))
    cfg = get_cfg(dict(task="segment", imgsz=64, batch=2, cache="device",
                       device_augment=True, max_instances=8))
    ds = build_yolo_dataset(cfg, data["train"], 2, data, mode="train")
    loader = build_dataloader(ds, 2, workers=1, shuffle=True, mode="train")
    assert isinstance(loader, DevicePoolLoader)

    it = iter(loader)
    seen = [next(it) for _ in range(4)]  # crosses an epoch boundary
    for b in seen:
        assert isinstance(b["img"], jax.Array)
        assert b["img"].shape == (2, 64, 64, 3) and b["img"].dtype == jnp.uint8
        assert b["segments"].shape[2:] == (360, 2)
    # pool contents match the host path for the same index
    want = ds[0]["img"]
    got = np.asarray(loader._take(loader.images, jnp.asarray([0])))[0]
    np.testing.assert_array_equal(got, want)


def test_device_pool_fallback_without_device_augment(dataset_dir, caplog):
    """cache='device' without the device-augment path falls back loudly to
    the thread loader instead of silently training uncached."""
    from yolo_contour_regression_tpu.cfg import get_cfg
    from yolo_contour_regression_tpu.data.build import (
        DataLoader as ThreadLoader, build_dataloader, build_yolo_dataset,
    )
    from yolo_contour_regression_tpu.data.utils import check_det_dataset

    data = check_det_dataset(str(dataset_dir / "data.yaml"))
    cfg = get_cfg(dict(task="segment", imgsz=64, batch=2, cache="device",
                       device_augment=False, max_instances=8))
    ds = build_yolo_dataset(cfg, data["train"], 2, data, mode="train")
    loader = build_dataloader(ds, 2, workers=1, shuffle=True, mode="train")
    assert isinstance(loader, ThreadLoader)
