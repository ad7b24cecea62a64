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
