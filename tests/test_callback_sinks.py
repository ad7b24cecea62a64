"""Package-gated logger sinks (reference utils/callbacks/*): with the real
packages absent in this image, each sink is exercised against a minimal fake
injected into sys.modules, asserting the reference's event contract — params
once at start, metrics per epoch, artifacts at end."""
import importlib
import json
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import pytest


def _trainer(tmp_path):
    wdir = tmp_path / "weights"
    wdir.mkdir(parents=True, exist_ok=True)
    (wdir / "best.ckpt").write_bytes(b"ckpt")
    (wdir / "last.ckpt").write_bytes(b"ckpt")
    (tmp_path / "results.png").write_bytes(b"png")
    return SimpleNamespace(
        args=SimpleNamespace(project=str(tmp_path), name="exp", task="segment"),
        save_dir=tmp_path,
        wdir=wdir,
        metrics={"metrics/mAP50-95(M)": 0.5},
        label_loss_items={"train/seg_loss": 1.25},
        epoch=3,
        callbacks={},
        best_fitness=0.5,
        fitness=0.5,
    )


def _with_fake(monkeypatch, name, fake, sink_modname):
    """Inject fake package, reload the sink module, return it; the module is
    reloaded back to its gated state by the caller's finalizer."""
    monkeypatch.setitem(sys.modules, name, fake)
    mod = importlib.import_module(
        f"yolo_contour_regression_tpu.utils.callbacks.{sink_modname}"
    )
    return importlib.reload(mod)


@pytest.fixture
def reload_after():
    mods = []
    yield mods
    for m in mods:
        importlib.reload(m)  # restore gated (package-absent) state


def test_comet_sink(tmp_path, monkeypatch, reload_after):
    events = []

    class Exp:
        def __init__(self, project_name=None):
            events.append(("init", project_name))
            fake.experiment = self

        def set_name(self, n):
            events.append(("name", n))

        def log_parameters(self, p):
            events.append(("params", len(p)))

        def log_metrics(self, m, step=None):
            events.append(("metrics", dict(m), step))

        def log_image(self, p, name=None):
            events.append(("image", name))

        def log_model(self, name, p):
            events.append(("model", name))

        def end(self):
            events.append(("end",))

    fake = types.ModuleType("comet_ml")
    fake.__version__ = "0.0"
    fake.experiment = None
    fake.Experiment = Exp
    fake.OfflineExperiment = Exp
    fake.get_global_experiment = lambda: fake.experiment
    mod = _with_fake(monkeypatch, "comet_ml", fake, "comet")
    reload_after.append(mod)

    t = _trainer(tmp_path)
    cbs = mod.callbacks(t)
    cbs["on_train_start"](t)
    cbs["on_fit_epoch_end"](t)
    cbs["on_train_end"](t)
    kinds = [e[0] for e in events]
    assert kinds == ["init", "name", "params", "metrics", "image", "model", "end"]
    assert events[3][1]["metrics/mAP50-95(M)"] == 0.5 and events[3][2] == 4


def test_clearml_sink(tmp_path, monkeypatch, reload_after):
    events = []

    class Logger:
        def report_scalar(self, title, series, value, iteration=None):
            events.append(("scalar", f"{title}/{series}", value))

        def report_image(self, **kw):
            events.append(("image", kw.get("title")))

        def report_single_value(self, k, v):
            events.append(("single", k, v))

    class Task:
        _current = None

        @classmethod
        def current_task(cls):
            return cls._current

        @classmethod
        def init(cls, **kw):
            cls._current = cls()
            events.append(("init", kw["project_name"]))
            return cls._current

        def connect(self, d, name=None):
            events.append(("connect", len(d)))

        def get_logger(self):
            return Logger()

        def update_output_model(self, **kw):
            events.append(("model", kw["model_name"]))

    fake = types.ModuleType("clearml")
    fake.__version__ = "0.0"
    fake.Task = Task
    mod = _with_fake(monkeypatch, "clearml", fake, "clearml")
    reload_after.append(mod)
    Task._current = None

    t = _trainer(tmp_path)
    cbs = mod.callbacks(t)
    cbs["on_train_start"](t)
    cbs["on_fit_epoch_end"](t)
    cbs["on_train_end"](t)
    kinds = [e[0] for e in events]
    assert kinds[:2] == ["init", "connect"]
    assert ("scalar", "train/seg_loss", 1.25) in events
    assert ("single", "metrics/mAP50-95(M)", 0.5) in events
    assert events[-1] == ("model", "exp")


def test_neptune_sink(tmp_path, monkeypatch, reload_after):
    events = []

    class Handle:
        def __init__(self, key):
            self.key = key

        def append(self, value=None, step=None):
            events.append(("append", self.key, value, step))

        def upload(self, f):
            events.append(("upload", self.key))

    class Run:
        def __getitem__(self, k):
            return Handle(k)

        def __setitem__(self, k, v):
            events.append(("set", k))

        def stop(self):
            events.append(("stop",))

    fake = types.ModuleType("neptune")
    fake.__version__ = "0.0"
    fake.init_run = lambda **kw: (events.append(("init", kw["name"])), Run())[1]
    ftypes = types.ModuleType("neptune.types")
    ftypes.File = lambda p: p
    fake.types = ftypes
    monkeypatch.setitem(sys.modules, "neptune.types", ftypes)
    mod = _with_fake(monkeypatch, "neptune", fake, "neptune")
    reload_after.append(mod)

    t = _trainer(tmp_path)
    cbs = mod.callbacks(t)
    cbs["on_train_start"](t)
    cbs["on_fit_epoch_end"](t)
    cbs["on_train_end"](t)
    kinds = [e[0] for e in events]
    assert kinds[:2] == ["init", "set"]
    assert ("append", "metrics/mAP50-95(M)", 0.5, 4) in events
    assert ("upload", "Plots/results") in events
    assert ("upload", "weights/best.ckpt") in events
    assert kinds[-1] == "stop"


def test_dvc_sink(tmp_path, monkeypatch, reload_after):
    events = []

    class Live:
        def __init__(self, **kw):
            events.append(("init",))

        def log_params(self, p):
            events.append(("params", len(p)))

        def log_metric(self, k, v, plot=True):
            events.append(("metric", k, v))

        def log_image(self, name, p):
            events.append(("image", name))

        def log_artifact(self, p, copy=True, type=None):
            events.append(("artifact", Path(p).name))

        def next_step(self):
            events.append(("step",))

        def end(self):
            events.append(("end",))

    fake = types.ModuleType("dvclive")
    fake.Live = Live
    mod = _with_fake(monkeypatch, "dvclive", fake, "dvc")
    reload_after.append(mod)

    t = _trainer(tmp_path)
    cbs = mod.callbacks(t)
    cbs["on_train_start"](t)
    cbs["on_fit_epoch_end"](t)
    cbs["on_fit_epoch_end"](t)  # second epoch: plot must NOT re-log (mtime dedupe)
    cbs["on_train_end"](t)
    kinds = [e[0] for e in events]
    assert kinds.count("image") == 1
    assert kinds.count("step") == 2
    assert ("metric", "metrics/mAP50-95(M)", 0.5) in events
    assert ("artifact", "best.ckpt") in events and kinds[-1] == "end"


def test_raytune_sink(tmp_path, monkeypatch, reload_after):
    reports = []
    fake = types.ModuleType("ray")
    fake.__version__ = "0.0"
    ftune = types.ModuleType("ray.tune")
    ftune.is_session_enabled = lambda: True
    fair = types.ModuleType("ray.air")
    fsession = types.ModuleType("ray.air.session")
    fsession.report = lambda m: reports.append(m)
    fair.session = fsession
    fake.tune = ftune
    monkeypatch.setitem(sys.modules, "ray.tune", ftune)
    monkeypatch.setitem(sys.modules, "ray.air", fair)
    monkeypatch.setitem(sys.modules, "ray.air.session", fsession)
    mod = _with_fake(monkeypatch, "ray", fake, "raytune")
    reload_after.append(mod)

    t = _trainer(tmp_path)
    cbs = mod.callbacks(t)
    cbs["on_fit_epoch_end"](t)
    assert reports == [{"metrics/mAP50-95(M)": 0.5, "epoch": 3}]


def test_hub_sink(tmp_path, monkeypatch):
    from yolo_contour_regression_tpu.hub.session import HubSession
    from yolo_contour_regression_tpu.utils.callbacks import hub as hub_sink

    monkeypatch.setattr(
        "yolo_contour_regression_tpu.hub.session.HUB_DIR", tmp_path / "hub"
    )
    t = _trainer(tmp_path)
    t.hub_session = None
    # no attach-time gate (ADVICE r2): handlers are returned and must no-op
    # while the session is unset, so a session attached AFTER
    # add_integration_callbacks still gets uploads (the reference's flow)
    cbs0 = hub_sink.callbacks(t)
    assert set(cbs0) == {"on_fit_epoch_end", "on_model_save", "on_train_end"}
    cbs0["on_fit_epoch_end"](t)  # must not raise with hub_session=None
    cbs0["on_train_end"](t)

    session = HubSession.__new__(HubSession)
    session.model_id = "m1"
    session.dir = tmp_path / "hub" / "m1"
    session.dir.mkdir(parents=True)
    session.metrics_queue = {}
    session.alive = True
    t.hub_session = session
    cbs = hub_sink.callbacks(t)
    cbs["on_fit_epoch_end"](t)
    cbs["on_model_save"](t)
    cbs["on_train_end"](t)
    rows = [
        json.loads(line)
        for line in (session.dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any(r["epoch"] == 3 and r["metrics/mAP50-95(M)"] == 0.5 for r in rows)
    assert (session.dir / "best.ckpt").exists()
    assert (session.dir / "done").exists() and not session.alive


def test_all_sinks_gated_noop(tmp_path):
    """With no integration packages installed, add_integration_callbacks must
    attach only tensorboard (tf present in this image) and never raise."""
    from yolo_contour_regression_tpu.utils.callbacks import (
        add_integration_callbacks,
        get_default_callbacks,
    )

    t = _trainer(tmp_path)
    t.callbacks = get_default_callbacks()
    add_integration_callbacks(t)  # must not raise
