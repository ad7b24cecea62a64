"""Callback bus + logger integrations.

Re-implements the reference ``utils/callbacks/``: the event dict with ~25 hook
points (base.py:150) plus integration sinks. TensorBoard uses tf.summary
(present in this image); the other integrations (wandb/comet/clearml/mlflow/
neptune/dvc/raytune) attach only when their packages are importable, exactly
like the reference's try-import gating.
"""
from __future__ import annotations

from typing import Callable, Dict, List

from .. import DEFAULT_CALLBACK_EVENTS, LOGGER


def get_default_callbacks() -> Dict[str, List[Callable]]:
    return {e: [] for e in DEFAULT_CALLBACK_EVENTS}


def add_integration_callbacks(instance):
    """Attach available integrations to a trainer-like object with a
    ``callbacks`` dict (reference callbacks/base.py:191). Mirrors the
    reference's nine sinks: tensorboard, wandb, mlflow, comet, clearml,
    neptune, dvclive, raytune, hub — each package-gated inside its module."""
    from . import clearml, comet, dvc, hub, mlflow, neptune, raytune, tensorboard, wb

    for module in (tensorboard, wb, mlflow, comet, clearml, neptune, dvc, raytune, hub):
        cbs = module.callbacks(instance)
        if not cbs:
            continue
        for event, fn in cbs.items():
            if fn not in instance.callbacks.get(event, []):
                instance.callbacks.setdefault(event, []).append(fn)


def run_callbacks(instance, event: str):
    for fn in instance.callbacks.get(event, []):
        try:
            fn(instance)
        except Exception as e:  # integrations must never kill training
            LOGGER.warning(f"callback {event} failed: {e}")
