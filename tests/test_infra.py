"""Infrastructure components: plotting, converter, autobatch, tuner space,
hub session, callbacks."""
import json
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest


def test_plot_images_and_results(tmp_path):
    from yolo_contour_regression_tpu.utils.plotting import plot_images, plot_results

    imgs = np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    batch = {
        "bboxes": np.tile(np.array([0.5, 0.5, 0.4, 0.4], np.float32), (4, 2, 1)),
        "cls": np.zeros((4, 2), np.int32),
        "mask_gt": np.ones((4, 2), bool),
        "segments": np.full((4, 2, 360, 2), 0.5, np.float32),
    }
    out = plot_images(imgs, batch, fname=str(tmp_path / "b.jpg"), names={0: "x"})
    assert out.shape == (64, 64, 3)
    assert (tmp_path / "b.jpg").exists()

    csv = tmp_path / "results.csv"
    csv.write_text("epoch,train/loss,val/map\n0,5.0,0.1\n1,4.0,0.2\n")
    png = plot_results(str(csv))
    assert png and Path(png).exists()


def test_coco_converter_polygons_and_rle(tmp_path):
    import cv2

    from yolo_contour_regression_tpu.data.converter import (
        convert_coco,
        mask_to_polygons,
        rle_to_mask,
    )

    # uncompressed RLE round trip: column-major runs
    m = np.zeros((4, 6), np.uint8)
    m[1:3, 2:5] = 1
    runs = []
    flat = m.T.reshape(-1)
    prev, count = 0, 0
    for v in flat:
        if v == prev:
            count += 1
        else:
            runs.append(count)
            prev, count = v, 1
    runs.append(count)
    back = rle_to_mask({"counts": runs, "size": [4, 6]}, 4, 6)
    np.testing.assert_array_equal(back, m)

    # full convert_coco on a tiny json
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 64, "width": 64}],
        "annotations": [
            {
                "id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
                "bbox": [8, 8, 16, 16],
                "segmentation": [[8, 8, 24, 8, 24, 24, 8, 24]],
            }
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    jd = tmp_path / "ann"
    jd.mkdir()
    (jd / "instances_val.json").write_text(json.dumps(coco))
    out = convert_coco(str(jd), save_dir=str(tmp_path / "conv"))
    txt = Path(out) / "labels" / "val" / "a.txt"
    assert txt.exists()
    line = txt.read_text().split()
    assert line[0] == "0"  # remapped 91->80: category 1 -> class 0
    vals = np.asarray([float(v) for v in line[1:]]).reshape(-1, 2)
    assert (vals >= 0).all() and (vals <= 1).all()


def test_autobatch_returns_power_of_two():
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.autobatch import check_train_batch_size

    m = build_model(
        Path(__file__).parent.parent / "yolo_contour_regression_tpu/cfg/models/yolov8-seg.yaml"
    )
    m.init(imgsz=64)
    b = check_train_batch_size(m, imgsz=64)
    assert b >= 1 and (b & (b - 1)) == 0


def test_tuner_mutation_in_bounds():
    from yolo_contour_regression_tpu.utils.tuner import SPACE, Tuner

    t = Tuner()
    parent = {k: (lo + hi) / 2 for k, (lo, hi, _) in SPACE.items()}
    t.history.append((0.5, parent))
    for _ in range(5):
        hyp = t._mutate(parent)
        for k, v in hyp.items():
            lo, hi, _ = SPACE[k]
            assert lo <= v <= hi


def test_ray_tune_gated_without_ray():
    import pytest

    from yolo_contour_regression_tpu.utils.tuner import run_ray_tune

    with pytest.raises(ImportError, match="evolutionary"):
        run_ray_tune("yolov8n-seg.yaml", data="x.yaml")


def test_ray_tune_with_fake_ray(monkeypatch):
    """run_ray_tune drives a real Ray surface (reference utils/tuner.py
    run_ray_tune): default space from SPACE, ASHA on the task metric, one
    model.train per sampled trial."""
    import sys
    import types

    from types import SimpleNamespace

    calls = {"trials": [], "asha": None, "fit": 0}

    class FakeTuner:
        def __init__(self, trainable, param_space=None, tune_config=None,
                     run_config=None):
            self.trainable = trainable
            self.space = param_space
            self.n = tune_config.num_samples

        def fit(self):
            calls["fit"] += 1
            for i in range(self.n):  # sample mid-range per trial
                cfg = {
                    k: (sum(v) / 2 if isinstance(v, tuple) else v)
                    for k, v in self.space.items()
                }
                self.trainable(cfg)

        def get_results(self):
            return calls["trials"]

    tune = types.ModuleType("ray.tune")
    tune.uniform = lambda lo, hi: (lo, hi)
    tune.Tuner = FakeTuner
    tune.TuneConfig = lambda scheduler=None, num_samples=1: SimpleNamespace(
        scheduler=scheduler, num_samples=num_samples
    )
    sched = types.ModuleType("ray.tune.schedulers")

    def asha(**kw):
        calls["asha"] = kw
        return "asha"

    sched.ASHAScheduler = asha
    air = types.ModuleType("ray.air")
    air.RunConfig = lambda **kw: kw
    ray = types.ModuleType("ray")
    ray.tune = tune
    for name, mod in (("ray", ray), ("ray.tune", tune),
                      ("ray.tune.schedulers", sched), ("ray.air", air)):
        monkeypatch.setitem(sys.modules, name, mod)

    from yolo_contour_regression_tpu.utils.tuner import SPACE, run_ray_tune

    model = SimpleNamespace(
        task="segment",
        train=lambda **cfg: calls["trials"].append(cfg),
    )
    results = run_ray_tune(model, data="tiny.yaml", max_samples=3, epochs=7)
    assert calls["fit"] == 1 and len(results) == 3
    assert calls["asha"]["metric"] == "metrics/mAP50-95(M)"
    assert calls["asha"]["max_t"] == 7
    for cfg in results:
        assert cfg["data"] == "tiny.yaml" and cfg["epochs"] == 7
        for k, (lo, hi, _) in SPACE.items():
            assert lo <= cfg[k] <= hi


def test_hub_session(tmp_path, monkeypatch):
    import yolo_contour_regression_tpu.hub.session as hs

    monkeypatch.setattr(hs, "HUB_DIR", tmp_path)
    s = hs.HubSession("run1")
    s.dir = tmp_path / "run1"
    s.dir.mkdir(parents=True, exist_ok=True)
    s.upload_metrics(0, {"loss": 1.0})
    s.upload_metrics(1, {"loss": 0.5})
    s.finish()
    lines = (s.dir / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    assert (s.dir / "done").exists()


def test_callbacks_bus():
    from yolo_contour_regression_tpu.utils.callbacks import get_default_callbacks, run_callbacks

    calls = []
    inst = SimpleNamespace(callbacks=get_default_callbacks())
    inst.callbacks["on_train_start"].append(lambda t: calls.append("start"))
    inst.callbacks["on_train_start"].append(lambda t: 1 / 0)  # must not raise
    run_callbacks(inst, "on_train_start")
    assert calls == ["start"]


def test_results_save_txt_and_crop(tmp_path):
    from yolo_contour_regression_tpu.engine.results import Results

    img = np.full((64, 64, 3), 120, np.uint8)
    boxes = np.array([[8, 8, 32, 32, 0.9, 0], [40, 40, 60, 60, 0.7, 1]], np.float32)
    res = Results(img, "x.jpg", {0: "a", 1: "b"}, boxes=boxes)
    txt = res.save_txt(str(tmp_path / "labels/x.txt"), save_conf=True)
    lines = open(txt).read().strip().splitlines()
    assert len(lines) == 2
    vals = lines[0].split()
    assert vals[0] == "0" and len(vals) == 6  # cls xywhn conf
    crops = res.save_crop(tmp_path / "crops", "x")
    assert len(crops) == 2
    import cv2

    assert cv2.imread(crops[0]).shape == (24, 24, 3)


def test_settings_manager(tmp_path):
    from yolo_contour_regression_tpu.utils.settings import SettingsManager

    p = tmp_path / "settings.json"
    s = SettingsManager(p)
    assert p.exists()
    s["runs_dir"] = "custom"
    s.save()
    s2 = SettingsManager(p)
    assert s2["runs_dir"] == "custom"
    p.write_text("{corrupt")
    s3 = SettingsManager(p)  # recovers to defaults
    assert s3["runs_dir"] == "runs"


def test_mosaic9_and_copy_paste():
    import random

    from yolo_contour_regression_tpu.data import augment as A
    from yolo_contour_regression_tpu.data.instance import Instances

    rng = random.Random(0)

    def mk(seed):
        r = np.random.default_rng(seed)
        img = r.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        seg = np.tile(np.array([[20.0, 20.0]], np.float32), (360, 1))
        t = np.linspace(0, 2 * np.pi, 360, endpoint=False)
        seg = np.stack([24 + 8 * np.cos(t), 24 + 8 * np.sin(t)], -1).astype(np.float32)
        inst = Instances(np.zeros(1), np.array([[16, 16, 32, 32]], np.float32), seg[None])
        return A.Sample(img, inst)

    s = A.mosaic9([mk(i) for i in range(9)], 32, rng)
    assert s.img.shape == (64, 64, 3)
    assert len(s.inst) >= 1
    assert (s.inst.bboxes >= 0).all() and (s.inst.bboxes <= 64).all()

    s2 = mk(0)
    n_before = len(s2.inst)
    out = A.copy_paste(s2, p=1.0, rng=rng)
    assert len(out.inst) >= n_before  # pasted or skipped on collision, never lost


def test_hub_api_surface(tmp_path, monkeypatch):
    """hub module API (reference hub/__init__.py): reset/export-formats/
    check_dataset against the local registry."""
    import yolo_contour_regression_tpu.hub.api as hub_api
    import yolo_contour_regression_tpu.hub.session as hub_session

    monkeypatch.setattr(hub_session, "HUB_DIR", tmp_path / "hub")
    monkeypatch.setattr(hub_api, "HUB_DIR", tmp_path / "hub")

    assert "onnx" in hub_api.export_fmts_hub()
    hub_api.start("k_m")  # deprecation shim must not raise
    with pytest.raises(AssertionError):
        hub_api.export_model("x", format="torchscript")

    # registry reset
    d = tmp_path / "hub" / "m1"
    d.mkdir(parents=True)
    (d / "metrics.jsonl").write_text("{}")
    hub_api.reset_model("m1")
    assert not (d / "metrics.jsonl").exists() and d.exists()

    # dataset zip check (detect)
    from tests.helpers import make_shape_dataset
    from yolo_contour_regression_tpu.utils.downloads import zip_directory

    make_shape_dataset(tmp_path / "ds", n_train=2, n_val=2, imgsz=32, seed=0)
    z = zip_directory(tmp_path / "ds")
    stats = hub_api.check_dataset(str(z), task="segment")
    assert stats["nc"] == 2


def test_results_api_compat():
    """Reference Results API surface: verbose/tojson/getitem/update/device
    no-ops (reference results.py:106-345)."""
    import json as _json

    import numpy as np

    from yolo_contour_regression_tpu.engine.results import Results

    img = np.zeros((80, 100, 3), np.uint8)
    boxes = np.array([
        [10, 10, 40, 40, 0.9, 0],
        [50, 20, 90, 60, 0.8, 1],
        [12, 14, 42, 44, 0.7, 0],
    ], np.float32)
    res = Results(img, "x.jpg", {0: "cat", 1: "dog"}, boxes=boxes)
    assert res.cpu() is res and res.numpy() is res and res.to("tpu") is res
    assert res.keys == ["boxes"]
    assert res.verbose() == "2 cats, 1 dog, "

    one = res[1]
    assert len(one) == 1 and int(one.boxes.cls[0]) == 1

    rows = _json.loads(res.tojson())
    assert [r["name"] for r in rows] == ["cat", "dog", "cat"]
    assert rows[0]["box"] == {"x1": 10.0, "y1": 10.0, "x2": 40.0, "y2": 40.0}
    norm = _json.loads(res.tojson(normalize=True))
    assert norm[0]["box"]["x2"] == 0.4  # 40 / w=100

    res.update(boxes=boxes[:1])
    assert len(res) == 1

    empty = res.new()
    assert len(empty) == 0 and empty.verbose() == "(no detections), "

def test_results_getitem_int_keeps_instance_dim():
    """Integer indexing keeps the leading instance axis for masks/contours/
    keypoints (reference keeps (1, ...) shapes; np.atleast_3d would append
    the new axis LAST — the ADVICE r2 finding)."""
    import numpy as np

    from yolo_contour_regression_tpu.engine.results import Results

    h, w, n = 48, 64, 3
    img = np.zeros((h, w, 3), np.uint8)
    boxes = np.array([[1, 1, 10, 10, 0.9, 0],
                      [2, 2, 20, 20, 0.8, 1],
                      [3, 3, 30, 30, 0.7, 0]], np.float32)
    masks = np.zeros((n, h, w), np.uint8)
    masks[:, :8, :8] = 1
    pts = np.random.RandomState(0).rand(n, 36, 2).astype(np.float32) * 16
    valid = np.ones((n, 36), bool)
    kpts = np.random.RandomState(1).rand(n, 17, 3).astype(np.float32)
    res = Results(img, "x.jpg", {0: "a", 1: "b"}, boxes=boxes, masks=masks,
                  contours=(pts, valid), keypoints=kpts)

    one = res[1]
    assert one.boxes.data.shape == (1, 6)
    assert one.masks.data.shape == (1, h, w)
    assert len(one.masks) == 1
    assert one.contours.points.shape == (1, 36, 2)
    assert one.contours.valid.shape == (1, 36)
    assert len(one.contours.xy) == 1
    assert one.keypoints.shape == (1, 17, 3)
    assert np.allclose(one.contours.points[0], pts[1])

    # slice indexing unchanged
    two = res[:2]
    assert two.masks.data.shape == (2, h, w)
    assert two.keypoints.shape == (2, 17, 3)
    # negative int also keeps the axis
    last = res[-1]
    assert last.masks.data.shape == (1, h, w)
    assert np.allclose(last.boxes.data[0], boxes[2])


def test_async_checkpoint_saver(tmp_path):
    """AsyncCheckpointSaver: on-device copy + background readback writes the
    same checkpoint as the sync path, saves stay ordered, wait() drains."""
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.utils.checkpoint import (
        AsyncCheckpointSaver,
        load_checkpoint,
    )

    trees = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "batch_stats": {},
        "ema_params": {"w": jnp.ones((2, 3))},
        "opt_state": None,
    }
    host_kw = dict(step=3, epoch=1, best_fitness=0.5,
                   train_args={"imgsz": 64}, model_yaml={"nc": 2},
                   names={0: "a"})
    saver = AsyncCheckpointSaver()
    p1, p2 = tmp_path / "last.ckpt", tmp_path / "best.ckpt"
    saver.submit([p1, p2], trees, host_kw)
    # second submit must join the first (ordering) and win on last.ckpt
    trees2 = dict(trees, params={"w": jnp.full((2, 3), 7.0)})
    saver.submit([p1], trees2, dict(host_kw, epoch=2))
    saver.wait()
    c1, c2 = load_checkpoint(p1), load_checkpoint(p2)
    assert c1["epoch"] == 2 and c2["epoch"] == 1
    np.testing.assert_allclose(c1["params"]["w"], 7.0)
    np.testing.assert_allclose(c2["params"]["w"],
                               np.arange(6.0).reshape(2, 3))
