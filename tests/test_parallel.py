"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4: the reference has no distributed tests at all)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_contour_regression_tpu.parallel import create_mesh, shard_batch
from yolo_contour_regression_tpu.parallel.mesh import replicate_tree


def test_mesh_over_8_devices():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual devices"
    mesh = create_mesh(devices[:8])
    assert mesh.shape == {"batch": 8}


def test_shard_batch_placement():
    mesh = create_mesh(jax.devices()[:8])
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xd = shard_batch(mesh, {"a": x})["a"]
    assert xd.sharding.spec[0] == "batch"
    np.testing.assert_array_equal(np.asarray(xd), x)


def test_2d_mesh_axes():
    mesh = create_mesh(jax.devices()[:8], axes={"batch": 4, "model": 2})
    assert mesh.shape == {"batch": 4, "model": 2}


def test_sharded_grad_matches_single_device():
    """The dp-sharded loss/grad must equal the single-device result (the
    all-reduce correctness check the reference never had)."""
    mesh = create_mesh(jax.devices()[:8])
    w = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 4)).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (8, 4)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(2).normal(0, 1, (8, 4)).astype(np.float32))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, x, y)
    w_r = replicate_tree(mesh, w)
    x_s = shard_batch(mesh, x)
    y_s = shard_batch(mesh, y)
    g_sharded = jax.jit(jax.grad(loss))(w_r, x_s, y_s)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tp_sharded_forward_matches_replicated():
    """Tensor-parallel param placement (conv output channels over 'model')
    must not change the math: GSPMD inserts the collectives, results match
    the replicated run bit-for-bit up to reduction order."""
    from yolo_contour_regression_tpu.parallel import shard_params_tp
    from yolo_contour_regression_tpu.parallel.mesh import param_sharding_rule

    mesh = create_mesh(jax.devices()[:8], axes={"batch": 4, "model": 2})
    rng = np.random.default_rng(0)
    params = {
        "k1": jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32)),
        "b1": jnp.asarray(rng.normal(0, 0.1, (16,)).astype(np.float32)),
        "k2": jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 8)).astype(np.float32)),
        "scalar": jnp.float32(2.0),
    }
    x = jnp.asarray(rng.normal(0, 1, (4, 8, 8, 8)).astype(np.float32))

    def f(p, x):
        y = jax.lax.conv_general_dilated(
            x, p["k1"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + p["b1"]
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, p["k2"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y * p["scalar"]

    ref = f(params, x)
    p_tp = shard_params_tp(mesh, params)
    # kernels sharded on O, scalar replicated
    assert not p_tp["k1"].sharding.is_fully_replicated
    assert p_tp["scalar"].sharding.is_fully_replicated
    assert param_sharding_rule(mesh, params["b1"]).spec == jax.sharding.PartitionSpec("model")
    x_s = shard_batch(mesh, x)
    got = jax.jit(f)(p_tp, x_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)

def test_build_train_mesh_shapes():
    from yolo_contour_regression_tpu.parallel.mesh import build_train_mesh

    devs = jax.devices()[:8]
    m1 = build_train_mesh(devs, batch=16, tp=1)
    assert dict(m1.shape) == {"batch": 8}
    m2 = build_train_mesh(devs, batch=16, tp=2)
    assert dict(m2.shape) == {"batch": 4, "model": 2}
    m3 = build_train_mesh(devs, batch=3, tp=2)  # dp adjusts to divide batch
    assert dict(m3.shape) == {"batch": 3, "model": 2}
    with pytest.raises(ValueError):
        build_train_mesh(devs[:7], batch=8, tp=2)


@pytest.mark.slow
def test_tp_train_step_matches_pure_dp():
    """One full polar train step on dp=4 x tp=2 must match pure dp=8:
    same loss, same updated params (VERDICT r2 next-#5 equivalence gate).
    Uses the SAME helpers BaseTrainer.train calls (build_train_mesh /
    place_train_state)."""
    import math
    from types import SimpleNamespace

    from yolo_contour_regression_tpu.engine.step import (
        init_train_state,
        make_train_step,
    )
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.parallel.mesh import (
        build_train_mesh,
        place_train_state,
    )
    from yolo_contour_regression_tpu.utils.optim import build_optimizer

    imgsz, nc, n_max, B = 64, 3, 4, 8
    model = build_model("yolov8-seg.yaml", nc=nc)
    variables = model.init(imgsz=imgsz)
    hyp = SimpleNamespace(
        lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
        warmup_epochs=0.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
        box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0,
        epochs=1, optimizer="SGD", cos_lr=False, batch=B, nbs=64, nc=nc,
    )
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    contour = np.stack([0.5 + 0.2 * np.cos(t), 0.5 + 0.2 * np.sin(t)], -1)
    images = rng.uniform(0, 1, (B, imgsz, imgsz, 3)).astype(np.float32)
    batch = {
        "cls": np.ones((B, n_max), np.int32),
        "bboxes": np.tile(np.array([0.5, 0.5, 0.4, 0.4], np.float32), (B, n_max, 1)),
        "segments": np.tile(contour.astype(np.float32), (B, n_max, 1, 1)),
        "mask_gt": np.zeros((B, n_max), bool),
    }
    batch["mask_gt"][:, 0] = True

    results = {}
    for tp in (1, 2):
        mesh = build_train_mesh(jax.devices()[:8], batch=B, tp=tp)
        tx = build_optimizer(variables["params"], hyp, steps_per_epoch=5, iterations=5)
        state = place_train_state(mesh, init_train_state(variables, tx))
        step = make_train_step(model, tx, hyp, cand=32, mesh=mesh, donate=False)
        with mesh:
            new_state, metrics = step(state, shard_batch(mesh, images), shard_batch(mesh, batch))
        results[tp] = (
            float(metrics["loss"]),
            jax.tree_util.tree_map(np.asarray, new_state.params),
        )

    l1, p1 = results[1]
    l2, p2 = results[2]
    assert abs(l1 - l2) < 1e-3 * max(abs(l1), 1.0), (l1, l2)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_spatial_partitioned_predict():
    """Spatial partitioning (parallel/mesh.py spatial_sharding): one image's
    H axis sharded 4-way, params replicated — GSPMD partitions the convs
    with automatic halo exchange; outputs must equal the unsharded predict.
    imgsz 256 keeps >= 2 rows/chip at stride 32."""
    import jax
    from jax.sharding import Mesh

    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.parallel.mesh import (
        replicate_tree,
        shard_spatial,
    )

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.array(devs[:4]), ("spatial",))

    m = build_model("yolov8-seg.yaml", nc=3)
    v = m.init(imgsz=256)
    x = np.random.default_rng(0).uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)

    want = np.asarray(jax.jit(m.predict)(v, jnp.asarray(x)))

    v_r = replicate_tree(mesh, v)
    x_s = shard_spatial(mesh, jnp.asarray(x))
    got = np.asarray(jax.jit(m.predict)(v_r, x_s))

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
