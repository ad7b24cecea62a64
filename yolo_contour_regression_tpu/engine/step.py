"""The jitted training step — one fused XLA program per device.

This is the TPU-native equivalent of the reference's inner loop
(trainer.py:330-377: AMP forward, backward, grad-accumulate, clip, optimizer
step, EMA update): forward + loss + grad + optimizer + EMA in ONE compiled
function, pjit-sharded over the ``batch`` mesh axis with replicated params.
Gradients are averaged by XLA-inserted collectives (the NCCL all-reduce
equivalent); loss scaling by world size (trainer.py:365) falls out of the
mean. Gradient accumulation uses ``optax.MultiSteps``-style scan-free
micro-batching via ``lax.scan`` when ``accumulate > 1``.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..utils import optim as optim_mod
from ..utils.loss import (
    classification_loss,
    detection_loss,
    pose_loss,
    segmentation_loss,
)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


def init_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        # explicit copy: astype() aliases the buffer when dtype already
        # matches, and aliased params/ema break jit donation
        ema_params=jax.tree_util.tree_map(
            lambda x: jnp.array(x, dtype=jnp.float32, copy=True), params
        ),
        step=jnp.zeros((), jnp.int32),
    )


def make_loss_fn(model, hyp, cand: int = 128) -> Callable:
    """(params, batch_stats, images, batch, step) -> (total, (items, stats)).
    ``step`` seeds per-step randomness (RT-DETR denoising noise)."""
    task = model.task

    def loss_fn(params, batch_stats, images, batch, step=0):
        variables = {"params": params, "batch_stats": batch_stats}
        if task == "rtdetr":
            # contrastive denoising groups (reference get_cdn_group wiring in
            # RTDETRDetectionLoss, models/utils/loss.py:295): noised GT copies
            # ride through the decoder alongside the matching queries
            from ..models.utils.loss import rtdetr_loss
            from ..models.utils.ops import get_cdn_group

            key = jax.random.fold_in(jax.random.PRNGKey(17), step)
            dn = get_cdn_group(batch, model.nc, key)
            out, new_stats = model.raw_forward(
                variables, images, train=True, head_extra=dn
            )
            total, items = rtdetr_loss(out, batch, model.nc, dn=dn)
            return total, (items, new_stats)
        out, new_stats = model.raw_forward(variables, images, train=True)
        if task == "segment":
            res = segmentation_loss(out, batch, model.strides, model.nc, hyp, cand=cand)
        elif task == "classify":
            res = classification_loss(out, batch)
        elif task == "pose":
            res = pose_loss(out, batch, model.strides, model.nc, hyp, model.kpt_shape, model.reg_max)
        elif task == "segment_ori":
            from ..utils.loss import segmentation_ori_loss

            res = segmentation_ori_loss(
                out, batch, model.strides, model.nc, hyp,
                nm=model.head_spec.kwargs.get("nm", 32), reg_max=model.reg_max,
            )
        else:
            res = detection_loss(out, batch, model.strides, model.nc, hyp, model.reg_max)
        return res.total, (res.items, new_stats)

    return loss_fn


def _make_step_body(
    model,
    tx: optax.GradientTransformation,
    hyp,
    cand: int = 128,
    accumulate: int = 1,
    augment_fn=None,
    aug_seed: int = 0,
):
    """The unjitted step: (state, images, batch) -> (state, metrics).

    Shared by ``make_train_step`` (one jitted dispatch per step) and
    ``make_multi_train_step`` (``lax.scan`` over K steps per dispatch), so
    both paths are numerically identical — augmentation randomness is keyed
    off ``state.step``, which the scan carries exactly like the host loop.
    """
    loss_fn = make_loss_fn(model, hyp, cand=cand)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    aug_base = jax.random.PRNGKey(aug_seed)

    def step_fn(state: TrainState, images, batch):
        if augment_fn is not None and accumulate <= 1:
            key = jax.random.fold_in(aug_base, state.step)
            images, batch = augment_fn(key, images, batch)
        if accumulate > 1:
            # micro-batch scan over pre-stacked (accumulate, B, ...) inputs
            # (sharded on axis 1 by parallel.shard_microbatches). Gradients
            # are SUMMED, matching the reference's loss.backward()
            # accumulation (trainer.py:371-377): the per-micro-batch loss is
            # already x batch_size, so the summed gradient scales with the
            # effective batch nbs exactly as the reference's does.
            def micro(carry, xs):
                g_acc, stats = carry
                im, bt, mi = xs
                if augment_fn is not None:
                    key = jax.random.fold_in(
                        jax.random.fold_in(aug_base, state.step), mi
                    )
                    im, bt = augment_fn(key, im, bt)
                (tot, (items, new_stats)), g = grad_fn(
                    state.params, stats, im, bt, state.step
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, new_stats), (tot, items)

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, new_stats), (totals, items) = jax.lax.scan(
                micro, (zeros, state.batch_stats),
                (images, batch, jnp.arange(accumulate)),
            )
            total = totals.mean()
            items = jax.tree_util.tree_map(jnp.mean, items)
        else:
            (total, (items, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, images, batch, state.step
            )

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = optim_mod.ema_update(state.ema_params, new_params, state.step + 1)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=new_ema,
            step=state.step + 1,
        )
        metrics = dict(items)
        metrics["loss"] = total
        return new_state, metrics

    return step_fn


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    hyp,
    cand: int = 128,
    accumulate: int = 1,
    mesh=None,
    donate: bool = True,
    augment_fn=None,
    aug_seed: int = 0,
):
    """Build the jitted step fn: (state, images, batch) -> (state, metrics).

    With a mesh, inputs are expected batch-sharded and state replicated; the
    same compiled fn covers 1..N chips (mesh of 1 == single-device).

    ``augment_fn`` (data/device_augment.make_augment_fn) folds the device-side
    train augmentation into the SAME compiled program: raw uint8 letterboxed
    batches come off the host, mosaic/warp/mixup/HSV/flips run on device and
    XLA overlaps them with the conv graph. Randomness is derived from
    (aug_seed, state.step[, micro index]) so steps are reproducible and
    resume-stable.
    """
    step_fn = _make_step_body(
        model, tx, hyp, cand=cand, accumulate=accumulate,
        augment_fn=augment_fn, aug_seed=aug_seed,
    )
    # GSPMD: with a mesh, the caller places `state` replicated
    # (parallel.replicate_tree) and `images`/`batch` batch-sharded
    # (parallel.shard_batch); jit propagates those shardings and XLA inserts
    # the gradient all-reduce over ICI. Single device needs no placement.
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_multi_train_step(
    model,
    tx: optax.GradientTransformation,
    hyp,
    cand: int = 128,
    mesh=None,
    donate: bool = True,
    augment_fn=None,
    aug_seed: int = 0,
    from_pool: bool = True,
    prebatch_augment: bool = False,
    labels_from_pool: bool = False,
):
    """K optimizer steps in ONE device dispatch.

    With ``from_pool`` (default): ``(state, pool, idxs, labels) -> (state,
    metrics)`` where ``pool`` is the HBM-resident uint8 image set
    (data/build.py DevicePoolLoader), ``idxs`` is ``(K, B)`` int32 sample
    indices and ``labels`` a dict of ``(K, B, ...)`` stacked label arrays. A
    ``lax.scan`` gathers each step's image batch from the pool on-device,
    runs augmentation + the fused train step, and carries the updated state —
    the host uploads only indices + labels (KBs) and pays ONE dispatch
    round-trip per K steps.

    With ``labels_from_pool`` additionally set, ``labels`` is instead the
    HBM-resident ``{key: (P, ...)}`` label pool
    (DevicePoolLoader.label_pool) and each step's ``(B, ...)`` slice is
    gathered on device next to the image gather — the host uploads ONLY
    the ``(K, B)`` int32 indices per dispatch.

    With ``from_pool=False`` (datasets too large for the HBM pool):
    ``(state, images, labels) -> (state, metrics)`` where ``images`` is a
    ``(K, B, H, W, 3)`` uint8 stack — one H2D burst + one dispatch per K
    steps instead of K of each.

    Why: on hosts where the accelerator sits behind a high-latency link (the
    tunneled-TPU deployment this repo targets), per-step dispatch costs
    ~650 ms while the step itself is ~30 ms (runs/e2e_train_bench.json) — the
    reference's per-step Python loop (trainer.py:330-377) is the wrong shape
    for that topology. Amortizing K steps per dispatch makes real training
    compute-bound. Metrics come back stacked ``(K,)`` per item.
    """
    prebatch_augment = prebatch_augment and augment_fn is not None and from_pool
    body = _make_step_body(
        model, tx, hyp, cand=cand, accumulate=1,
        augment_fn=None if prebatch_augment else augment_fn, aug_seed=aug_seed,
    )
    batch_sharding = None
    if mesh is not None and "batch" in mesh.axis_names and mesh.shape["batch"] > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("batch"))

    def _shard(imgs, lab):
        if batch_sharding is not None:
            # pool/stack + idx arrive replicated; re-shard the per-step batch
            # and labels so augment + step run data-parallel exactly like the
            # one-dispatch-per-step path
            imgs = jax.lax.with_sharding_constraint(imgs, batch_sharding)
            lab = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_sharding),
                lab,
            )
        return imgs, lab

    def _lab_gather(labels, idx):
        # labels_from_pool: labels is the HBM-resident (P, ...) label pool
        # (data/build.py DevicePoolLoader.label_pool) — gather the step's
        # (B, ...) slice on device, like the image pool. Kills the
        # per-dispatch H2D of stacked f32 contours, which on a tunneled
        # host rivals the step itself (~46 KB/img over a ~32 MB/s link).
        return jax.tree_util.tree_map(
            lambda a: jnp.take(a, idx, axis=0), labels
        )

    if from_pool and prebatch_augment:
        # Augment ALL K batches in ONE vectorized call before the scan, then
        # scan the pure step over the pre-augmented (K, B, ...) stack. Same
        # math as the in-scan path, but the augment's many small per-batch
        # ops (tile gathers, 1-D resample weight builds, HSV select chains)
        # run once at K*B instead of K times at B — far better VPU/MXU
        # utilization at train batch sizes. Mosaic/mixup partners draw from
        # the whole K*B superbatch (strictly more diversity than in-batch).
        # Costs transient HBM for the (K*B) tile stack (~630 MB uint8 at
        # K=8, B=16, 640px) — keep K*B <= ~128 at 640px.
        aug_base = jax.random.PRNGKey(aug_seed)

        def multi_fn(state: TrainState, pool, idxs, labels):
            K, B = idxs.shape
            imgs = jnp.take(pool, idxs.reshape(-1), axis=0)
            if labels_from_pool:
                flat = _lab_gather(labels, idxs.reshape(-1))
            else:
                flat = jax.tree_util.tree_map(
                    lambda x: x.reshape((K * B,) + x.shape[2:]), labels
                )
            key = jax.random.fold_in(aug_base, state.step)
            aug_imgs, aug_lab = augment_fn(key, imgs, flat)
            aug_imgs = aug_imgs.reshape((K, B) + aug_imgs.shape[1:])
            aug_lab = jax.tree_util.tree_map(
                lambda x: x.reshape((K, B) + x.shape[1:]), aug_lab
            )

            def scan_body(st, xs):
                im, lab = _shard(*xs)
                st, metrics = body(st, im, lab)
                return st, metrics

            return jax.lax.scan(scan_body, state, (aug_imgs, aug_lab))
    elif from_pool and labels_from_pool:
        def multi_fn(state: TrainState, pool, idxs, labels):
            def scan_body(st, idx):
                imgs, lab = _shard(
                    jnp.take(pool, idx, axis=0), _lab_gather(labels, idx)
                )
                st, metrics = body(st, imgs, lab)
                return st, metrics

            return jax.lax.scan(scan_body, state, idxs)
    elif from_pool:
        def multi_fn(state: TrainState, pool, idxs, labels):
            def scan_body(st, xs):
                idx, lab = xs
                imgs, lab = _shard(jnp.take(pool, idx, axis=0), lab)
                st, metrics = body(st, imgs, lab)
                return st, metrics

            return jax.lax.scan(scan_body, state, (idxs, labels))
    else:
        def multi_fn(state: TrainState, images, labels):
            def scan_body(st, xs):
                imgs, lab = xs
                imgs, lab = _shard(imgs, lab)
                st, metrics = body(st, imgs, lab)
                return st, metrics

            return jax.lax.scan(scan_body, state, (images, labels))

    # donate the state (argnum 0) but never the pool: it must survive across
    # dispatches for the whole run
    return jax.jit(multi_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh=None):
    """Jitted eval forward + decode; EMA params, batch-sharded inputs."""

    def eval_fn(params, batch_stats, images):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.predict(variables, images)

    return jax.jit(eval_fn)
