"""Torch .pt -> native .ckpt migration (utils/torch_convert.py)."""
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

CFG = Path(__file__).parent.parent / "yolo_contour_regression_tpu/cfg/models"


def test_conv_bn_numeric_parity():
    """A torch Conv2d+BN2d(+ReLU) block forwards identically to our flax Conv
    after weight conversion (the core kernel/BN mapping)."""
    import jax.numpy as jnp
    import torch.nn as tnn

    from yolo_contour_regression_tpu.nn.modules.conv import Conv
    from yolo_contour_regression_tpu.utils.torch_convert import (
        convert_state_dict,
    )

    torch.manual_seed(0)
    tconv = tnn.Conv2d(3, 8, 3, stride=1, padding=1, bias=False)
    tbn = tnn.BatchNorm2d(8, eps=1e-3, momentum=0.03)
    tbn.weight.data.uniform_(0.5, 1.5)
    tbn.bias.data.uniform_(-0.5, 0.5)
    tbn.running_mean.uniform_(-0.2, 0.2)
    tbn.running_var.uniform_(0.5, 1.5)
    tconv.eval(), tbn.eval()

    x = torch.rand(1, 3, 16, 16)
    with torch.no_grad():
        want = torch.relu(tbn(tconv(x))).numpy()  # NCHW

    m = Conv(8, 3)
    v = m.init({"params": __import__("jax").random.PRNGKey(0)},
               jnp.zeros((1, 16, 16, 3)), train=False)
    state = {
        "model.0.conv.weight": tconv.weight.detach().numpy(),
        "model.0.bn.weight": tbn.weight.detach().numpy(),
        "model.0.bn.bias": tbn.bias.detach().numpy(),
        "model.0.bn.running_mean": tbn.running_mean.numpy(),
        "model.0.bn.running_var": tbn.running_var.numpy(),
        "model.0.bn.num_batches_tracked": np.zeros(()),
    }
    wrapped = {
        "params": {"layer0": dict(v["params"])},
        "batch_stats": {"layer0": dict(v["batch_stats"])},
    }
    new_vars, report = convert_state_dict(state, wrapped, strict=True)
    assert report["converted"] == 5
    out = m.apply(
        {"params": new_vars["params"]["layer0"],
         "batch_stats": new_vars["batch_stats"]["layer0"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), want, atol=2e-5
    )


def _inverse_name(path):
    """our flax param path -> torch dotted name (test-side inverse)."""
    toks = []
    for p in path:
        s = str(getattr(p, "key", p))
        if s.startswith("layer"):
            toks.append(s[5:])
        elif s.startswith("m") and s[1:].isdigit():
            toks += ["m", s[1:]]
        elif "_" in s and all(t.isdigit() for t in s.split("_")[1:]) and s.split("_")[1:]:
            parts = s.split("_")
            toks += [parts[0]] + parts[1:]
        else:
            toks.append(s)
    return toks


def test_full_model_roundtrip_yolov8n_seg():
    """Every learnable tensor of yolov8n-seg maps: synthesize a torch-style
    state dict from a randomly-initialized param tree (inverse naming), run
    the converter, and check values land exactly where they came from."""
    import jax

    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.torch_convert import convert_state_dict

    m = build_model(CFG / "yolov8-seg.yaml", nc=3)
    v = m.init(imgsz=64)

    rng = np.random.default_rng(0)
    state = {}

    def emit(tree, coll, path=()):
        for k, val in tree.items():
            if isinstance(val, dict):
                emit(val, coll, path + (k,))
                continue
            toks = _inverse_name(path)
            leaf = {
                ("params", "kernel"): "weight",
                ("params", "scale"): "weight",
                ("params", "bias"): "bias",
                ("batch_stats", "mean"): "running_mean",
                ("batch_stats", "var"): "running_var",
            }[(coll, k)]
            # RepConv inverse: conv1/bn1/conv2/bn2/bn_id -> torch nesting
            rep = {"conv1": ["conv1", "conv"], "bn1": ["conv1", "bn"],
                   "conv2": ["conv2", "conv"], "bn2": ["conv2", "bn"],
                   "bn_id": ["bn"]}
            if toks and toks[-1] in rep and path[-2:] != ("proto",):
                toks = toks[:-1] + rep[toks[-1]]
            name = "model." + ".".join(toks + [leaf])
            arr = rng.normal(size=np.asarray(val).shape).astype(np.float32)
            if k == "kernel":
                arr_t = (
                    arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
                )
            else:
                arr_t = arr
            state[name] = arr_t
            expected[(coll,) + path + (k,)] = arr

    expected = {}
    emit(v["params"], "params")
    emit(v.get("batch_stats", {}), "batch_stats")

    new_vars, report = convert_state_dict(state, v, strict=True)
    assert not report["missed"], report["missed"][:5]
    assert not report["unmatched_target"], report["unmatched_target"][:5]

    flat = {}

    def collect(tree, coll, path=()):
        for k, val in tree.items():
            if isinstance(val, dict):
                collect(val, coll, path + (k,))
            else:
                flat[(coll,) + path + (k,)] = np.asarray(val)

    collect(new_vars["params"], "params")
    collect(new_vars["batch_stats"], "batch_stats")
    for key, want in expected.items():
        np.testing.assert_allclose(flat[key], want, atol=1e-6, err_msg=str(key))


def test_tolerant_unpickler_and_end_to_end(tmp_path):
    """A .pt holding an object of an UNIMPORTABLE class (as ultralytics
    checkpoints do) loads via stubbing, and convert_torch_checkpoint writes a
    loadable native checkpoint."""
    import torch.nn as tnn

    from yolo_contour_regression_tpu.utils.torch_convert import (
        convert_torch_checkpoint,
        extract_state_dict,
        load_torch_checkpoint,
    )

    # a genuinely importable temp module whose import later fails, like
    # loading an ultralytics checkpoint without ultralytics installed
    import importlib
    import sys

    mod_dir = tmp_path / "fakepkg"
    mod_dir.mkdir()
    (mod_dir / "fake_ultra_tasks_xyz.py").write_text(
        "import torch.nn as tnn\n"
        "class DetectionModel(tnn.Module):\n"
        "    def __init__(self):\n"
        "        super().__init__()\n"
        "        self.conv = tnn.Conv2d(3, 4, 1)\n"
    )
    sys.path.insert(0, str(mod_dir))
    fake = importlib.import_module("fake_ultra_tasks_xyz")
    model = fake.DetectionModel()
    pt = tmp_path / "last.pt"
    torch.save({"model": model, "epoch": 7, "train_args": {"imgsz": 64}}, pt)
    sys.path.remove(str(mod_dir))
    del sys.modules["fake_ultra_tasks_xyz"]
    (mod_dir / "fake_ultra_tasks_xyz.py").unlink()

    ckpt = load_torch_checkpoint(pt)
    assert ckpt["epoch"] == 7
    state = extract_state_dict(ckpt)
    assert "conv.weight" in state and state["conv.weight"].shape == (4, 3, 1, 1)

    # full pipeline on a real architecture: random torch-shaped weights for
    # the tiny detect yaml would need a real reference model; here we only
    # assert the plumbing produces a loadable ckpt (weights stay random where
    # unmatched, reported not fatal)
    out, report = convert_torch_checkpoint(
        pt, CFG / "yolov8-seg.yaml", out_path=str(tmp_path / "m.ckpt"),
        nc=3, imgsz=64,
    )
    from yolo_contour_regression_tpu.engine.model import YOLO

    y = YOLO(out)
    assert y.model.nc == 3
