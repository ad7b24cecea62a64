"""Hyperparameter tuning.

Re-implements both reference tuning paths:
  - ``engine/tuner.py`` Tuner: mutation-based evolutionary search over the
    augmentation/lr hyperparameter space (the torch-free default here).
  - ``utils/tuner.py`` run_ray_tune: Ray Tune wiring, gated on ray being
    importable (absent in this image).
"""
from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from . import LOGGER

# search space: (min, max, gain) per hyperparameter (reference engine/tuner.py)
SPACE: Dict[str, tuple] = {
    "lr0": (1e-5, 1e-1, 1.0),
    "lrf": (0.01, 1.0, 1.0),
    "momentum": (0.6, 0.98, 0.3),
    "weight_decay": (0.0, 0.001, 1.0),
    "warmup_epochs": (0.0, 5.0, 1.0),
    "warmup_momentum": (0.0, 0.95, 1.0),
    "box": (0.02, 0.2, 1.0),
    "cls": (0.2, 4.0, 1.0),
    "hsv_h": (0.0, 0.1, 1.0),
    "hsv_s": (0.0, 0.9, 1.0),
    "hsv_v": (0.0, 0.9, 1.0),
    "degrees": (0.0, 45.0, 1.0),
    "translate": (0.0, 0.9, 1.0),
    "scale": (0.0, 0.9, 1.0),
    "shear": (0.0, 10.0, 1.0),
    "perspective": (0.0, 0.001, 1.0),
    "flipud": (0.0, 1.0, 1.0),
    "fliplr": (0.0, 1.0, 1.0),
    "mosaic": (0.0, 1.0, 1.0),
    "mixup": (0.0, 1.0, 1.0),
    "copy_paste": (0.0, 1.0, 1.0),
}


class Tuner:
    """Evolutionary mutation search (reference engine/tuner.py Tuner)."""

    def __init__(self, model_path: str = "yolov8n-seg.yaml", space=None, seed: int = 0):
        self.model_path = model_path
        self.space = space or SPACE
        self.rng = random.Random(seed)
        self.history = []  # (fitness, hyp)

    def _mutate(self, parent: Dict[str, float], mutation: float = 0.8, sigma: float = 0.2):
        hyp = dict(parent)
        keys = list(self.space.keys())
        while True:
            changed = False
            for k in keys:
                if self.rng.random() < mutation:
                    lo, hi, gain = self.space[k]
                    v = hyp.get(k, (lo + hi) / 2)
                    v *= 1.0 + self.rng.gauss(0, 1) * sigma * gain
                    hyp[k] = float(np.clip(v, lo, hi))
                    changed = True
            if changed:
                return hyp

    def __call__(self, data: str, iterations: int = 10, epochs: int = 10, **train_kwargs):
        from ..engine.model import YOLO

        base = {k: (lo + hi) / 2 if k not in ("lr0",) else 0.01 for k, (lo, hi, _) in self.space.items()}
        best_hyp, best_fit = dict(base), -1.0
        for i in range(iterations):
            hyp = self._mutate(best_hyp) if self.history else dict(base)
            model = YOLO(self.model_path)
            try:
                metrics = model.train(data=data, epochs=epochs, **{**hyp, **train_kwargs})
                fit = float(metrics.get("fitness", 0.0))
            except Exception as e:
                LOGGER.warning(f"tuner iteration {i} failed: {e}")
                fit = 0.0
            self.history.append((fit, hyp))
            if fit > best_fit:
                best_fit, best_hyp = fit, hyp
            LOGGER.info(f"tune {i + 1}/{iterations}: fitness {fit:.4f} (best {best_fit:.4f})")
        return best_hyp, best_fit


# per-task fitness metric reported to the scheduler (reference cfg TASK2METRIC)
TASK2METRIC = {
    "detect": "metrics/mAP50-95(B)",
    "segment": "metrics/mAP50-95(M)",
    "classify": "metrics/accuracy_top1",
    "pose": "metrics/mAP50-95(P)",
}


def run_ray_tune(model, space=None, grace_period: int = 10,
                 max_samples: int = 10, storage_path: str = "./runs/tune",
                 **train_args):
    """Ray Tune hyperparameter search (reference utils/tuner.py:run_ray_tune):
    ASHA scheduler over the shared SPACE, one trial = one ``model.train``.
    SDK-gated like the callback sinks — raises ImportError with the built-in
    alternative when ray is absent (it is not baked into this image)."""
    try:
        from ray import tune
        from ray.air import RunConfig
        from ray.tune.schedulers import ASHAScheduler
    except ImportError as e:
        raise ImportError(
            "ray tune is not installed in this environment; use Tuner() for "
            "the built-in evolutionary search"
        ) from e

    if not space:
        space = {k: tune.uniform(lo, hi) for k, (lo, hi, _) in SPACE.items()}
        LOGGER.warning("search space not provided, using default search space")
    if "data" not in train_args:
        raise ValueError("run_ray_tune requires data=<dataset yaml>")
    space["data"] = train_args.pop("data")

    model_path = getattr(model, "model_path", None) or getattr(model, "ckpt_path", None) or model
    task = getattr(model, "task", "segment")
    metric = TASK2METRIC.get(task, "metrics/mAP50-95(M)")

    def _trial(config):
        # each trial builds its own model: trials are separate workers and a
        # jitted-program cache must not be shared across processes
        from ..engine.model import YOLO

        m = model if hasattr(model, "train") else YOLO(model_path)
        m.train(**{**config, **train_args})

    scheduler = ASHAScheduler(
        time_attr="epoch", metric=metric, mode="max",
        max_t=train_args.get("epochs", 100), grace_period=grace_period,
        reduction_factor=3,
    )
    tuner = tune.Tuner(
        _trial,
        param_space=space,
        tune_config=tune.TuneConfig(scheduler=scheduler, num_samples=max_samples),
        run_config=RunConfig(storage_path=storage_path),
    )
    tuner.fit()
    return tuner.get_results()
