"""Native w8a8 int8 inference (nn/quant.py): numerics of the quantized conv
path and end-to-end mAP on the committed floor checkpoint."""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def test_quant_conv_matches_f32():
    """One deploy Conv: int8 per-channel weights + calibrated input scale
    reproduce the f32 output to ~1% relative error, and the int8 kernel
    actually flows through the int8 conv path."""
    from yolo_contour_regression_tpu.nn.modules.conv import (
        Conv,
        deploy_mode,
        quant_calibration,
        quant_mode,
    )
    from yolo_contour_regression_tpu.nn.quant import quantize_tree

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 8)).astype(np.float32))
    mod = Conv(c2=12, k=3, act=False)
    with deploy_mode(True):
        variables = mod.init(jax.random.PRNGKey(0), x)
        yf = mod.apply(variables, x)
        cal = {}
        with quant_calibration(cal):
            mod.apply(variables, x)
    assert list(cal) == [""]  # top-level module path
    qtree, n_q, n_skip = quantize_tree(dict(variables["params"]), cal)
    assert n_q == 1 and n_skip == 0
    assert qtree["conv"]["kernel"].dtype == jnp.int8
    with deploy_mode(True), quant_mode(True):
        yq = mod.apply({"params": qtree}, x)
    err = float(jnp.abs(yq - yf).max() / (jnp.abs(yf).max() + 1e-8))
    assert err < 0.02, f"int8 conv error {err:.4f}"


def test_quantize_tree_skips_depthwise():
    from yolo_contour_regression_tpu.nn.modules.conv import (
        DWConv,
        deploy_mode,
        quant_calibration,
    )
    from yolo_contour_regression_tpu.nn.quant import quantize_tree

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 6)).astype(np.float32))
    mod = DWConv(c2=6, k=3)
    with deploy_mode(True):
        variables = mod.init(jax.random.PRNGKey(0), x)
        cal = {}
        with quant_calibration(cal):
            mod.apply(variables, x)
    qtree, n_q, n_skip = quantize_tree(dict(variables["params"]), cal)
    assert n_q == 0 and n_skip == 1
    assert qtree["dw"]["conv"]["kernel"].dtype == jnp.float32


@pytest.mark.slow
def test_quantized_floor_checkpoint_map(tmp_path):
    """Fuse + int8-quantize the committed seg floor checkpoint (calibrated on
    its own val images) and assert the quantized model still clears the
    committed mAP floor — the end-to-end accuracy contract for the int8
    deploy path."""
    import cv2

    from tests.helpers import make_shape_dataset
    from yolo_contour_regression_tpu.engine.model import YOLO

    ckpt = ROOT / "runs" / "floor" / "best.ckpt"
    record_p = ROOT / "runs" / "floor" / "floor.json"
    if not (ckpt.exists() and record_p.exists()):
        pytest.skip("committed floor checkpoint missing")
    record = json.loads(record_p.read_text())
    cfg = record["config"]
    yaml_path = make_shape_dataset(
        tmp_path / "ds", n_train=cfg["n_train"], n_val=cfg["n_val"],
        imgsz=cfg["imgsz"], seed=cfg["seed"],
    )
    val_dir = Path(str(yaml_path)).parent / "images" / "val"
    imgs = [
        cv2.imread(str(p))[..., ::-1].astype(np.float32) / 255.0
        for p in sorted(val_dir.glob("*.jpg"))[:8]
    ]
    calib = [np.stack(imgs[:4]), np.stack(imgs[4:8])]

    m = YOLO(str(ckpt))
    m.quantize(calib)
    assert getattr(m.model, "quantized", False)
    res = m.val(data=str(yaml_path), imgsz=cfg["imgsz"], batch=4,
                project=str(tmp_path / "runs"))
    floor_m = record["floor"]["mask_mAP50-95"]
    assert res["metrics/mAP50-95(M)"] >= floor_m, (
        f"int8 mask mAP {res['metrics/mAP50-95(M)']:.4f} < floor {floor_m}"
    )


def test_quantized_save_load_roundtrip(tmp_path):
    """model.quantize -> save -> YOLO(path) restores the int8 deploy model
    with identical predictions (the reference cannot persist fused/int8
    state outside vendor formats)."""
    from yolo_contour_regression_tpu.engine.model import YOLO

    rng = np.random.default_rng(2)
    calib = [rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)]
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))

    m = YOLO("yolov8n-seg.yaml")
    m._ensure_variables(64)
    m.quantize(calib)
    y1 = np.asarray(m.model.predict(m.variables, x))

    p = m.save(str(tmp_path / "q.ckpt"))
    m2 = YOLO(p)
    assert getattr(m2.model, "quantized", False)
    y2 = np.asarray(m2.model.predict(m2.variables, x))
    np.testing.assert_allclose(y2, y1, rtol=1e-5, atol=1e-5)


def test_int8_ckpt_autobackend_not_refused(tmp_path):
    """AutoBackend on an int8 checkpoint must NOT re-fuse it (fuse_variables
    is idempotent on deploy state): re-fusing used to strip the quant wrapper
    and convolve int8 codes as f32 weights — silent garbage."""
    from yolo_contour_regression_tpu.engine.model import YOLO
    from yolo_contour_regression_tpu.nn.autobackend import AutoBackend

    rng = np.random.default_rng(3)
    calib = [rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)]
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)

    m = YOLO("yolov8n-seg.yaml")
    m._ensure_variables(64)
    m.quantize(calib)
    y1 = np.asarray(m.model.predict(m.variables, jnp.asarray(x)))

    p = m.save(str(tmp_path / "q.ckpt"))
    backend = AutoBackend(p)
    y2 = np.asarray(backend(x))
    np.testing.assert_allclose(y2, y1, rtol=1e-5, atol=1e-5)


def test_refuse_requantize_guards(tmp_path):
    """fuse()/quantize() on an int8 handle raise instead of corrupting; a
    second fuse() on a fused handle is a no-op."""
    import pytest

    from yolo_contour_regression_tpu.engine.model import YOLO

    rng = np.random.default_rng(4)
    calib = [rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)]

    m = YOLO("yolov8n-seg.yaml")
    m._ensure_variables(64)
    m.fuse()
    v_before = m.variables
    m.fuse()  # idempotent, not a double-fold
    assert m.variables is v_before

    m.quantize(calib)
    with pytest.raises(RuntimeError, match="int8"):
        m.fuse()
    with pytest.raises(RuntimeError, match="int8"):
        m.quantize(calib)
    with pytest.raises(RuntimeError, match="int8"):
        m.export(format="onnx")


def test_selective_quantization_quantizes_only_deep_layers():
    """selective=True converts only convs where the on-chip micro-bench says
    int8 beats bf16 (cin >= 128, nn/quant.py int8_wins); everything else
    keeps its f32 kernel, and the mixed model still runs."""
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.engine.model import YOLO

    rng = np.random.default_rng(5)
    calib = [rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)]
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))

    m = YOLO("yolov8s-seg.yaml")  # s-scale so cin>=128 layers exist at 64px
    m._ensure_variables(64)
    m.quantize(calib, selective=True)

    n_int8 = n_f32 = 0

    def walk(node):
        nonlocal n_int8, n_f32
        if isinstance(node, dict):
            if "kernel" in node:
                k = node["kernel"]
                if k.dtype == jnp.int8:
                    n_int8 += 1
                    assert k.shape[2] >= 128, (
                        f"selective mode quantized a cin={k.shape[2]} conv"
                    )
                else:
                    n_f32 += 1
            for v in node.values():
                walk(v)

    walk(m.variables["params"])
    assert n_int8 > 0, "no deep layers quantized"
    assert n_f32 > 0, "selective mode quantized everything"
    y = np.asarray(m.model.predict(m.variables, x))
    assert np.isfinite(y).all()
