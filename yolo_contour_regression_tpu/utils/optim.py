"""Optimizer / schedule / EMA construction — optax.

TPU-native re-implementation of the reference's optimization stack:
  - ``build_optimizer`` (reference trainer.py:642-696): 3 parameter groups —
    biases (no weight decay, special warmup lr), norm scales (no decay),
    conv/dense kernels (decayed) — 'auto' rule picks SGD(0.01, nesterov) for
    long runs and AdamW(lr fit to nc) for short ones.
  - warmup interpolation (trainer.py:320-329): first max(warmup_epochs*nb,100)
    steps ramp lr from 0 (bias group: warmup_bias_lr) to the scheduled value,
    and SGD momentum from warmup_momentum to momentum.
  - linear / cosine (``one_cycle``, torch_utils.py:318) epoch schedules.
  - ``ModelEMA`` decay ramp ``0.9999 * (1 - exp(-updates/2000))``
    (torch_utils.py:344-377) as a pure update fn.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def param_group_label(path: Tuple, leaf) -> str:
    """bias / norm / weight grouping by param tree path."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    last = keys[-1] if keys else ""
    in_norm = any("bn" in str(k).lower() or "batchnorm" in str(k).lower() for k in keys)
    if last == "bias":
        return "bias"
    if in_norm or (last == "scale"):
        return "norm"
    return "weight"


def label_tree(params) -> Any:
    return jax.tree_util.tree_map_with_path(param_group_label, params)


def lr_schedule(hyp, steps_per_epoch: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Epoch-level decay x step-level warmup, as one step->lr fn."""
    lr0, lrf = hyp.lr0, hyp.lrf
    epochs = max(int(hyp.epochs), 1)
    nb = max(steps_per_epoch, 1)
    nw = max(round(hyp.warmup_epochs * nb), 100) if hyp.warmup_epochs > 0 else 0

    def lf(epoch):
        if getattr(hyp, "cos_lr", False):
            return ((1 - jnp.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1
        return (1 - epoch / epochs) * (1.0 - lrf) + lrf

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / nb)
        base = lr0 * lf(epoch)
        if nw == 0:
            return base
        warm = base * jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(step < nw, warm, base)

    return sched


def bias_lr_schedule(hyp, steps_per_epoch: int):
    """Bias group warms from warmup_bias_lr down/up to the scheduled lr."""
    base_sched = lr_schedule(hyp, steps_per_epoch)
    nb = max(steps_per_epoch, 1)
    nw = max(round(hyp.warmup_epochs * nb), 100) if hyp.warmup_epochs > 0 else 0

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        base = base_sched(jnp.maximum(step, nw))  # post-warmup target
        if nw == 0:
            return base_sched(step)
        frac = jnp.clip(step / nw, 0.0, 1.0)
        warm = hyp.warmup_bias_lr + (base - hyp.warmup_bias_lr) * frac
        return jnp.where(step < nw, warm, base_sched(step))

    return sched


def momentum_schedule(hyp, steps_per_epoch: int):
    """SGD momentum warmup: warmup_momentum -> momentum over the warmup steps
    (reference trainer.py:325-329 per-step np.interp of group['momentum'])."""
    nb = max(steps_per_epoch, 1)
    nw = max(round(hyp.warmup_epochs * nb), 100) if hyp.warmup_epochs > 0 else 0
    mom = float(hyp.momentum)
    warm = float(getattr(hyp, "warmup_momentum", mom))
    if nw == 0:
        return lambda step: jnp.asarray(mom, jnp.float32)

    def sched(step):
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / nw, 0.0, 1.0)
        return warm + (mom - warm) * frac

    return sched


def build_optimizer(
    params, hyp, steps_per_epoch: int, iterations: int
) -> optax.GradientTransformation:
    """'auto' optimizer selection + 3-group transform (reference
    trainer.py:642-696 build_optimizer)."""
    name = str(getattr(hyp, "optimizer", "auto"))
    nc = getattr(hyp, "nc", 80) or 80
    if name == "auto":
        if iterations > 10000:
            name, lr0, mom = "SGD", 0.01, 0.9
        else:
            name, lr0, mom = "AdamW", round(0.002 * 5 / (4 + nc), 6), 0.9
        hyp.lr0, hyp.momentum, hyp.warmup_bias_lr = lr0, mom, 0.0
    sched = lr_schedule(hyp, steps_per_epoch)
    bias_sched = bias_lr_schedule(hyp, steps_per_epoch)
    mom_sched = momentum_schedule(hyp, steps_per_epoch)

    def core(schedule, wd: float = 0.0):
        if name == "AdamW":
            # decoupled weight decay (torch.optim.AdamW): decay applied after
            # the adaptive update scaling, not folded into the gradient
            return optax.adamw(
                learning_rate=schedule, b1=hyp.momentum, b2=0.999, weight_decay=wd
            )
        if name in ("Adam", "NAdam", "RAdam", "Adamax"):
            opt = {
                "Adam": optax.adam, "NAdam": optax.nadam,
                "RAdam": optax.radam, "Adamax": optax.adamax,
            }[name](learning_rate=schedule, b1=hyp.momentum, b2=0.999)
        elif name == "RMSProp":
            opt = optax.rmsprop(learning_rate=schedule, momentum=hyp.momentum)
        else:  # SGD, nesterov momentum (reference trainer.py:687), with the
            # warmup_momentum->momentum ramp injected as a per-step schedule
            opt = optax.inject_hyperparams(optax.sgd, static_args=("nesterov",))(
                learning_rate=schedule, momentum=mom_sched, nesterov=True
            )
        if wd:
            # coupled L2 (torch SGD/Adam weight_decay semantics): decay enters
            # the gradient before the momentum/adaptive update
            opt = optax.chain(optax.add_decayed_weights(wd), opt)
        return opt

    wd = hyp.weight_decay * getattr(hyp, "batch", 16) * getattr(hyp, "accumulate", 1) / getattr(hyp, "nbs", 64)

    tx = optax.multi_transform(
        {
            "weight": core(sched, wd=wd),
            "bias": core(bias_sched),
            "norm": core(sched),
        },
        label_tree(params),
    )
    # global-norm clip 10.0 (reference trainer.py:493)
    return optax.chain(optax.clip_by_global_norm(10.0), tx)


def ema_decay(step, decay: float = 0.9999, tau: float = 2000.0):
    """ModelEMA ramp (reference torch_utils.py:356)."""
    return decay * (1.0 - jnp.exp(-jnp.asarray(step, jnp.float32) / tau))


def ema_update(ema_params, params, step, decay: float = 0.9999, tau: float = 2000.0):
    d = ema_decay(step, decay, tau)
    return jax.tree_util.tree_map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params)
