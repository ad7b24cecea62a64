"""auto_annotate (reference data/annotator.py:9–48): polar-contour default
plus the reference's detector-boxes -> SAM-mask refinement flow, driven with
a fake detector and the deterministic stub SAM from test_sam_generate."""
import numpy as np

from yolo_contour_regression_tpu.engine.results import Results

from test_sam_generate import OBJECTS, S, StubSam


class FakeYOLO:
    """Detector stand-in: yields one Results with the planted boxes."""

    results = None

    def __init__(self, model, **kw):
        pass

    def predict(self, source, **kw):
        yield FakeYOLO.results


def _run(tmp_path, monkeypatch, result, **kw):
    import yolo_contour_regression_tpu.engine.model as em
    from yolo_contour_regression_tpu.data.annotator import auto_annotate

    FakeYOLO.results = result
    monkeypatch.setattr(em, "YOLO", FakeYOLO)
    src = tmp_path / "imgs"
    src.mkdir()
    (src / "a.jpg").write_bytes(b"")  # the fake detector never reads it
    out = auto_annotate(str(src), output_dir=str(tmp_path / "labels"), **kw)
    files = list((tmp_path / "labels").glob("*.txt"))
    assert len(files) == 1
    return files[0].read_text().strip().splitlines()


def test_auto_annotate_sam_refined(tmp_path, monkeypatch):
    img = np.full((S, S, 3), 127, np.uint8)
    boxes = np.array(
        [list(o) + [0.9, k] for k, o in enumerate(OBJECTS)], np.float32
    )
    res = Results(orig_img=img, path=str(tmp_path / "imgs/a.jpg"),
                  names={0: "a", 1: "b", 2: "c"}, boxes=boxes)
    lines = _run(tmp_path, monkeypatch, res, sam_model=StubSam())
    assert len(lines) == len(OBJECTS)
    for line, (x0, y0, x1, y1) in zip(sorted(lines), OBJECTS):
        vals = line.split()
        cls, coords = int(vals[0]), np.asarray(vals[1:], np.float32).reshape(-1, 2)
        # polygon stays inside (a dilated) GT box and spans most of it
        px, py = coords[:, 0] * S, coords[:, 1] * S
        assert px.min() >= x0 - 5 and px.max() <= x1 + 5
        assert py.min() >= y0 - 5 and py.max() <= y1 + 5
        assert (px.max() - px.min()) > 0.5 * (x1 - x0)


def test_auto_annotate_polar_default(tmp_path, monkeypatch):
    img = np.zeros((S, S, 3), np.uint8)
    tri = np.zeros((1, 36, 2), np.float32)
    tri[0, :3] = [[10, 10], [30, 10], [20, 30]]
    valid = np.zeros((1, 36), bool)
    valid[0, :3] = True
    res = Results(orig_img=img, path=str(tmp_path / "imgs/a.jpg"),
                  names={0: "a"},
                  boxes=np.array([[10, 10, 30, 30, 0.9, 0]], np.float32),
                  contours=(tri, valid))
    lines = _run(tmp_path, monkeypatch, res)
    assert len(lines) == 1 and lines[0].startswith("0 ")
    coords = np.asarray(lines[0].split()[1:], np.float32).reshape(-1, 2)
    np.testing.assert_allclose(coords * S, tri[0, :3], atol=0.05)


def test_convert_script_exists_and_parses():
    """models/nas/model.py points users at this script — it must exist and
    expose the documented CLI."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "examples/scripts/convert_torch_ckpt.py", "--help"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0 and "model_yaml" in r.stdout
