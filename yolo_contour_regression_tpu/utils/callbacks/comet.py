"""Comet sink (reference utils/callbacks/comet.py): experiment init at train
start, per-epoch metric/curve logging, plot images and the best model at train
end. Attaches only when the ``comet_ml`` package is importable (same gating as
the reference comet.py:11-19)."""
from __future__ import annotations

import os

from .. import LOGGER

try:
    import comet_ml

    assert hasattr(comet_ml, "__version__")
except (ImportError, AssertionError):  # pragma: no cover
    comet_ml = None

_PLOT_FILES = (
    "results.png",
    "confusion_matrix.png",
    "confusion_matrix_normalized.png",
    "F1_curve.png",
    "PR_curve.png",
    "P_curve.png",
    "R_curve.png",
)


def _experiment():
    return comet_ml.get_global_experiment() if comet_ml else None


def callbacks(instance):
    if comet_ml is None:
        return {}

    def on_train_start(trainer):
        if _experiment() is not None:
            return
        mode = os.environ.get("COMET_MODE", "online").lower()
        cls = comet_ml.OfflineExperiment if mode == "offline" else comet_ml.Experiment
        try:
            exp = cls(project_name=str(getattr(trainer.args, "project", None) or "YOLO-polar-tpu"))
            exp.set_name(str(getattr(trainer.args, "name", None) or trainer.save_dir.name))
            exp.log_parameters(
                {k: str(v) for k, v in vars(trainer.args).items() if not callable(v)}
            )
        except Exception as e:
            LOGGER.warning(f"comet_ml installed but failed to initialize: {e}")

    def on_fit_epoch_end(trainer):
        exp = _experiment()
        if exp is None:
            return
        row = {**getattr(trainer, "label_loss_items", {}), **trainer.metrics}
        exp.log_metrics(
            {k: float(v) for k, v in row.items() if isinstance(v, (int, float))},
            step=getattr(trainer, "epoch", 0) + 1,
        )

    def on_train_end(trainer):
        exp = _experiment()
        if exp is None:
            return
        for f in _PLOT_FILES:
            p = trainer.save_dir / f
            if p.exists():
                exp.log_image(str(p), name=p.stem)
        best = trainer.wdir / "best.ckpt"
        if best.exists():
            exp.log_model("best", str(best))
        exp.end()
        LOGGER.info("comet experiment finished")

    return {
        "on_train_start": on_train_start,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_train_end": on_train_end,
    }
