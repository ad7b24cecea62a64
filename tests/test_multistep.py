"""Multi-step-per-dispatch training (engine/step.py make_multi_train_step):
K optimizer steps as one lax.scan dispatch over the HBM image pool must be
numerically identical to K host-driven dispatches, and the trainer must run
end-to-end through the path (cache='device' + device_augment)."""
import math
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_shape_dataset


@pytest.fixture(scope="module")
def ds_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("multistep")
    return make_shape_dataset(root / "ds", n_train=12, n_val=4, imgsz=96)


def test_superbatches_shapes_and_epoch_coverage(ds_yaml):
    from yolo_contour_regression_tpu.cfg import get_cfg
    from yolo_contour_regression_tpu.data.build import (
        DevicePoolLoader,
        build_dataloader,
        build_yolo_dataset,
    )
    from yolo_contour_regression_tpu.data.utils import check_det_dataset

    data = check_det_dataset(str(ds_yaml))
    cfg = get_cfg(dict(task="segment", imgsz=64, batch=2, cache="device",
                       device_augment=True, max_instances=8))
    ds = build_yolo_dataset(cfg, data["train"], 2, data, mode="train")
    loader = build_dataloader(ds, 2, workers=1, shuffle=True, mode="train")
    assert isinstance(loader, DevicePoolLoader)
    steps = len(loader)  # 12 imgs / batch 2 = 6 steps/epoch
    assert steps == 6

    k = 4  # -> groups of 4 then 2 per epoch
    it = loader.superbatches(k)
    seen = []
    for expect in (4, 2, 4, 2):  # two epochs
        idxs, labels = next(it)
        assert idxs.shape == (expect, 2) and idxs.dtype == np.int32
        for key in ("cls", "bboxes", "segments", "mask_gt"):
            assert labels[key].shape[:2] == (expect, 2), key
        assert labels["segments"].shape[2:] == (labels["cls"].shape[2], 360, 2)
        seen.append(idxs)
    # each epoch's groups cover every sample exactly once
    ep1 = np.concatenate([seen[0].ravel(), seen[1].ravel()])
    assert sorted(ep1.tolist()) == list(range(12))


@pytest.mark.slow
def test_multistep_equals_sequential():
    """scan-of-K == K dispatches: same losses, same final params. Randomness
    is keyed off state.step in both paths, so augmentation draws match."""
    from yolo_contour_regression_tpu.data.device_augment import make_augment_fn
    from yolo_contour_regression_tpu.engine.step import (
        init_train_state,
        make_multi_train_step,
        make_train_step,
    )
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.optim import build_optimizer

    imgsz, nc, n_max, B, K, P = 64, 3, 4, 2, 3, 8
    model = build_model("yolov8-seg.yaml", nc=nc)
    variables = model.init(imgsz=imgsz)
    hyp = SimpleNamespace(
        lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
        warmup_epochs=0.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
        box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0,
        epochs=1, optimizer="SGD", cos_lr=False, batch=B, nbs=B, nc=nc,
        # light augmentation: geometry + flip, no blur-prone extremes
        mosaic=1.0, mixup=0.0, degrees=5.0, translate=0.1, scale=0.3,
        shear=0.0, perspective=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
        fliplr=0.5, flipud=0.0,
    )
    rng = np.random.default_rng(3)
    pool = rng.integers(0, 255, (P, imgsz, imgsz, 3), np.uint8)
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    contour = np.stack([0.5 + 0.2 * np.cos(t), 0.5 + 0.2 * np.sin(t)], -1)
    idxs = rng.integers(0, P, (K, B)).astype(np.int32)
    labels = {
        "cls": np.ones((K, B, n_max), np.int32),
        "bboxes": np.tile(np.array([0.5, 0.5, 0.4, 0.4], np.float32),
                          (K, B, n_max, 1)),
        "segments": np.tile(contour.astype(np.float32), (K, B, n_max, 1, 1)),
        "mask_gt": np.zeros((K, B, n_max), bool),
        "content_hw": np.full((K, B, 2), imgsz, np.float32),
        "pad_tl": np.zeros((K, B, 2), np.float32),
    }
    labels["mask_gt"][:, :, 0] = True

    aug = make_augment_fn(hyp, imgsz, max_instances=8, mesh=None)
    tx = build_optimizer(variables["params"], hyp, steps_per_epoch=K, iterations=K)

    step = make_train_step(model, tx, hyp, cand=32, donate=False,
                           augment_fn=aug, aug_seed=0)
    state_a = init_train_state(variables, tx)
    losses_seq = []
    for k in range(K):
        lab_k = {key: jnp.asarray(v[k]) for key, v in labels.items()}
        state_a, m = step(state_a, jnp.asarray(pool[idxs[k]]), lab_k)
        losses_seq.append(float(m["loss"]))

    multi = make_multi_train_step(model, tx, hyp, cand=32, donate=False,
                                  augment_fn=aug, aug_seed=0)
    state_b = init_train_state(variables, tx)
    state_b, sm = multi(state_b, jnp.asarray(pool), jnp.asarray(idxs),
                        {k: jnp.asarray(v) for k, v in labels.items()})
    losses_multi = np.asarray(sm["loss"])

    # loss trajectory: step 1 is bit-identical inputs, later steps drift only
    # by float reassociation (scan vs unrolled fusion) amplified through the
    # assigner's hard argmax — trajectory-level agreement is the contract
    np.testing.assert_allclose(losses_multi, losses_seq, rtol=1e-3)
    assert abs(losses_multi[0] - losses_seq[0]) < 1e-4 * max(abs(losses_seq[0]), 1.0)
    assert int(state_b.step) == K

    # one-step param equivalence at tight tolerance (same K=1 scan program)
    state_c = init_train_state(variables, tx)
    state_c, _ = multi(state_c, jnp.asarray(pool), jnp.asarray(idxs[:1]),
                       {k: jnp.asarray(v[:1]) for k, v in labels.items()})
    state_d = init_train_state(variables, tx)
    state_d, _ = step(
        state_d, jnp.asarray(pool[idxs[0]]),
        {key: jnp.asarray(v[0]) for key, v in labels.items()},
    )
    for a, b in zip(jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, state_c.params)),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, state_d.params))):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


@pytest.mark.heavy
def test_multistep_under_mesh():
    """Multi-step dispatch over an 8-device batch mesh: pool replicated,
    gathered batches + labels re-sharded inside the scan, loss finite and
    params advance. (The driver's multichip dryrun covers the per-step path;
    this covers the scan path.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolo_contour_regression_tpu.data.device_augment import make_augment_fn
    from yolo_contour_regression_tpu.engine.step import (
        init_train_state,
        make_multi_train_step,
    )
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.parallel.mesh import (
        build_train_mesh,
        place_train_state,
    )
    from yolo_contour_regression_tpu.utils.optim import build_optimizer

    imgsz, nc, n_max, B, K, P_ = 64, 3, 4, 8, 2, 16
    model = build_model("yolov8-seg.yaml", nc=nc)
    variables = model.init(imgsz=imgsz)
    hyp = SimpleNamespace(
        lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
        warmup_epochs=0.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
        box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0,
        epochs=1, optimizer="SGD", cos_lr=False, batch=B, nbs=B, nc=nc,
        mosaic=1.0, mixup=0.0, degrees=0.0, translate=0.1, scale=0.3,
        shear=0.0, perspective=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
        fliplr=0.5, flipud=0.0,
    )
    rng = np.random.default_rng(5)
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    contour = np.stack([0.5 + 0.2 * np.cos(t), 0.5 + 0.2 * np.sin(t)], -1)
    mesh = build_train_mesh(jax.devices()[:8], batch=B, tp=1)
    pool = jax.device_put(
        rng.integers(0, 255, (P_, imgsz, imgsz, 3), np.uint8),
        NamedSharding(mesh, P()),
    )
    idxs = rng.integers(0, P_, (K, B)).astype(np.int32)
    labels = {
        "cls": np.ones((K, B, n_max), np.int32),
        "bboxes": np.tile(np.array([0.5, 0.5, 0.4, 0.4], np.float32),
                          (K, B, n_max, 1)),
        "segments": np.tile(contour.astype(np.float32), (K, B, n_max, 1, 1)),
        "mask_gt": np.zeros((K, B, n_max), bool),
        "content_hw": np.full((K, B, 2), imgsz, np.float32),
        "pad_tl": np.zeros((K, B, 2), np.float32),
    }
    labels["mask_gt"][:, :, 0] = True
    aug = make_augment_fn(hyp, imgsz, max_instances=8, mesh=mesh)
    tx = build_optimizer(variables["params"], hyp, steps_per_epoch=K, iterations=K)
    state = place_train_state(mesh, init_train_state(variables, tx))
    multi = make_multi_train_step(model, tx, hyp, cand=32, mesh=mesh,
                                  donate=False, augment_fn=aug, aug_seed=0)
    with mesh:
        new_state, sm = multi(state, pool, jnp.asarray(idxs), labels)
    losses = np.asarray(sm["loss"])
    assert losses.shape == (K,) and np.isfinite(losses).all()
    assert int(new_state.step) == K


@pytest.mark.slow
def test_trainer_multistep_e2e(ds_yaml, tmp_path):
    """Facade train with cache='device' exercises the multistep branch
    (steps_per_dispatch>1) end-to-end: metrics, csv, checkpoints."""
    from yolo_contour_regression_tpu import YOLO

    m = YOLO("yolov8n-seg.yaml")
    metrics = m.train(
        data=str(ds_yaml), epochs=2, imgsz=64, batch=4, nbs=4, workers=1,
        project=str(tmp_path / "runs"), warmup_epochs=0.0, val=True,
        max_instances=8, cand_per_gt=32, patience=10, close_mosaic=0,
        cache="device", device_augment=True, steps_per_dispatch=2,
        plots=True,
    )
    assert m.trainer.used_multistep
    assert "metrics/mAP50-95(M)" in metrics
    lines = (m.trainer.save_dir / "results.csv").read_text().strip().splitlines()
    assert len(lines) == 3
    assert (m.trainer.save_dir / "train_batch0.jpg").exists()
    wdir = m.trainer.wdir
    assert (wdir / "last.ckpt").exists() and (wdir / "best.ckpt").exists()


@pytest.mark.slow
def test_trainer_multistep_stacked_e2e(ds_yaml, tmp_path):
    """Without the HBM pool (no cache), multistep runs in stacked mode: K
    uint8 batches stacked host-side, one H2D + scan per dispatch."""
    from yolo_contour_regression_tpu import YOLO

    m = YOLO("yolov8n-seg.yaml")
    metrics = m.train(
        data=str(ds_yaml), epochs=1, imgsz=64, batch=4, nbs=4, workers=1,
        project=str(tmp_path / "runs"), warmup_epochs=0.0, val=True,
        max_instances=8, cand_per_gt=32, patience=10, close_mosaic=0,
        device_augment=True, steps_per_dispatch=3, plots=False,
    )
    assert m.trainer.used_multistep
    assert "metrics/mAP50-95(M)" in metrics
    assert (m.trainer.wdir / "last.ckpt").exists()


@pytest.mark.slow
def test_multistep_prebatch_augment():
    """prebatch_augment=True: ONE vectorized K*B augment before the scan.
    Shapes/labels contract matches the in-scan path, losses are finite, the
    state advances K steps, and with augmentation effectively disabled
    (p=0 everywhere, scale=0) the two variants are numerically identical."""
    from yolo_contour_regression_tpu.data.device_augment import make_augment_fn
    from yolo_contour_regression_tpu.engine.step import (
        init_train_state,
        make_multi_train_step,
    )
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.optim import build_optimizer

    imgsz, nc, n_max, B, K, P = 64, 3, 4, 2, 3, 8
    model = build_model("yolov8-seg.yaml", nc=nc)
    variables = model.init(imgsz=imgsz)

    def hyp_of(**aug):
        base = dict(
            lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
            warmup_epochs=0.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
            box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0,
            epochs=1, optimizer="SGD", cos_lr=False, batch=B, nbs=B, nc=nc,
        )
        base.update(aug)
        return SimpleNamespace(**base)

    rng = np.random.default_rng(7)
    pool = jnp.asarray(rng.integers(0, 255, (P, imgsz, imgsz, 3), np.uint8))
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    contour = np.stack([0.5 + 0.2 * np.cos(t), 0.5 + 0.2 * np.sin(t)], -1)
    idxs = jnp.asarray(rng.integers(0, P, (K, B)).astype(np.int32))
    labels = {
        "cls": np.ones((K, B, n_max), np.int32),
        "bboxes": np.tile(np.array([0.5, 0.5, 0.4, 0.4], np.float32),
                          (K, B, n_max, 1)),
        "segments": np.tile(contour.astype(np.float32), (K, B, n_max, 1, 1)),
        "mask_gt": np.zeros((K, B, n_max), bool),
        "content_hw": np.full((K, B, 2), imgsz, np.float32),
        "pad_tl": np.zeros((K, B, 2), np.float32),
    }
    labels["mask_gt"][:, :, 0] = True
    labels = {k: jnp.asarray(v) for k, v in labels.items()}

    # --- real augmentation: contract + trainability ----------------------
    hyp = hyp_of(mosaic=1.0, mixup=0.5, degrees=0.0, translate=0.1, scale=0.3,
                 shear=0.0, perspective=0.0, hsv_h=0.015, hsv_s=0.7,
                 hsv_v=0.4, fliplr=0.5, flipud=0.0)
    aug = make_augment_fn(hyp, imgsz, max_instances=8, mesh=None)
    tx = build_optimizer(variables["params"], hyp, steps_per_epoch=K, iterations=K)
    multi = make_multi_train_step(model, tx, hyp, cand=32, donate=False,
                                  augment_fn=aug, aug_seed=0,
                                  prebatch_augment=True)
    state = init_train_state(variables, tx)
    new_state, sm = multi(state, pool, idxs, labels)
    losses = np.asarray(sm["loss"])
    assert losses.shape == (K,) and np.isfinite(losses).all()
    assert int(new_state.step) == K

    # --- augmentation a no-op: prebatch == in-scan bit-for-bit -----------
    hyp0 = hyp_of(mosaic=0.0, mixup=0.0, degrees=0.0, translate=0.0,
                  scale=0.0, shear=0.0, perspective=0.0, hsv_h=0.0,
                  hsv_s=0.0, hsv_v=0.0, fliplr=0.0, flipud=0.0)
    aug0 = make_augment_fn(hyp0, imgsz, max_instances=8, mesh=None)
    tx0 = build_optimizer(variables["params"], hyp0, steps_per_epoch=K, iterations=K)
    outs = []
    for pre in (False, True):
        fn = make_multi_train_step(model, tx0, hyp0, cand=32, donate=False,
                                   augment_fn=aug0, aug_seed=0,
                                   prebatch_augment=pre)
        st, m_ = fn(init_train_state(variables, tx0), pool, idxs, labels)
        outs.append((st, np.asarray(m_["loss"])))
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4)


@pytest.mark.slow
def test_multistep_labels_from_pool_matches_host_labels():
    """labels_from_pool: gathering the per-step (B, ...) label slice from
    the HBM-resident (P, ...) pool must match shipping the stacked
    (K, B, ...) host arrays — same inputs reach the step, so the loss
    trajectory and final params agree."""
    from yolo_contour_regression_tpu.data.device_augment import make_augment_fn
    from yolo_contour_regression_tpu.engine.step import (
        init_train_state,
        make_multi_train_step,
    )
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.optim import build_optimizer

    imgsz, nc, n_max, B, K, P = 64, 3, 4, 2, 3, 8
    model = build_model("yolov8-seg.yaml", nc=nc)
    variables = model.init(imgsz=imgsz)
    hyp = SimpleNamespace(
        lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
        warmup_epochs=0.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
        box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0,
        epochs=1, optimizer="SGD", cos_lr=False, batch=B, nbs=B, nc=nc,
        mosaic=1.0, mixup=0.0, degrees=0.0, translate=0.1, scale=0.3,
        shear=0.0, perspective=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
        fliplr=0.5, flipud=0.0,
    )
    rng = np.random.default_rng(11)
    pool = jnp.asarray(rng.integers(0, 255, (P, imgsz, imgsz, 3), np.uint8))
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    # per-sample DISTINCT labels so a wrong gather can't silently pass
    segs = np.stack([
        np.stack([0.5 + (0.1 + 0.02 * p) * np.cos(t),
                  0.5 + (0.1 + 0.02 * p) * np.sin(t)], -1)
        for p in range(P)
    ]).astype(np.float32)  # (P, 360, 2)
    lab_pool = {
        "cls": np.tile(np.arange(P, dtype=np.int32)[:, None] % nc, (1, n_max)),
        "bboxes": np.tile(np.array([0.5, 0.5, 0.3, 0.3], np.float32),
                          (P, n_max, 1)),
        "segments": np.tile(segs[:, None], (1, n_max, 1, 1)),
        "mask_gt": np.tile(np.array([True] + [False] * (n_max - 1)), (P, 1)),
        "content_hw": np.full((P, 2), imgsz, np.float32),
        "pad_tl": np.zeros((P, 2), np.float32),
    }
    idxs = rng.integers(0, P, (K, B)).astype(np.int32)
    host_labels = {k: v[idxs] for k, v in lab_pool.items()}  # (K, B, ...)

    aug = make_augment_fn(hyp, imgsz, max_instances=8, mesh=None)
    tx = build_optimizer(variables["params"], hyp, steps_per_epoch=K, iterations=K)

    fn_pool = make_multi_train_step(model, tx, hyp, cand=32, donate=False,
                                    augment_fn=aug, aug_seed=0,
                                    labels_from_pool=True)
    st_a, m_a = fn_pool(init_train_state(variables, tx), pool,
                        jnp.asarray(idxs),
                        {k: jnp.asarray(v) for k, v in lab_pool.items()})

    fn_host = make_multi_train_step(model, tx, hyp, cand=32, donate=False,
                                    augment_fn=aug, aug_seed=0)
    st_b, m_b = fn_host(init_train_state(variables, tx), pool,
                        jnp.asarray(idxs),
                        {k: jnp.asarray(v) for k, v in host_labels.items()})

    np.testing.assert_allclose(np.asarray(m_a["loss"]), np.asarray(m_b["loss"]),
                               rtol=1e-3)
    assert int(st_a.step) == K
    for a, b in zip(jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, st_a.params)),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, st_b.params))):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_label_pool_and_idx_only_superbatches(ds_yaml):
    """DevicePoolLoader.label_pool stages the whole label set once with the
    dataset-wide instance bucket; superbatches(idx_only=True) yields bare
    index groups whose on-device gather reproduces the host-stacked labels
    exactly."""
    from yolo_contour_regression_tpu.cfg import get_cfg
    from yolo_contour_regression_tpu.data.build import (
        DevicePoolLoader,
        build_dataloader,
        build_yolo_dataset,
    )
    from yolo_contour_regression_tpu.data.utils import check_det_dataset

    data = check_det_dataset(str(ds_yaml))
    cfg = get_cfg(dict(task="segment", imgsz=64, batch=2, cache="device",
                       device_augment=True, max_instances=8))
    ds = build_yolo_dataset(cfg, data["train"], 2, data, mode="train")
    loader = build_dataloader(ds, 2, workers=1, shuffle=True, mode="train")
    assert isinstance(loader, DevicePoolLoader)

    pool = loader.label_pool()
    P_ = len(loader.labels)
    _, cap = loader._instance_cap()
    for key in ("cls", "bboxes", "segments", "mask_gt"):
        assert pool[key].shape[0] == P_, key
        assert pool[key].shape[1] == cap, key
    assert pool["segments"].shape[2:] == (360, 2)
    assert loader.label_pool() is pool  # cached, staged once

    # idx_only groups + device gather == the host-stacked labels
    it_idx = loader.superbatches(3, idx_only=True)
    idxs, none = next(it_idx)
    assert none is None and idxs.dtype == np.int32
    host = loader._stack_labels([int(j) for j in idxs[0]])
    for key in ("cls", "bboxes", "segments", "mask_gt"):
        np.testing.assert_array_equal(
            np.asarray(pool[key])[idxs[0]], host[key], err_msg=key)
