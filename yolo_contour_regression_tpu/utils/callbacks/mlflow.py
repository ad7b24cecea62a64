"""MLflow sink (reference utils/callbacks/mlflow.py): params once at setup,
metrics per epoch, model artifacts at train end. Attaches only when the
``mlflow`` package is importable (same gating as the reference)."""
from __future__ import annotations

import os

from .. import LOGGER

try:
    import mlflow

    assert hasattr(mlflow, "__version__")
except (ImportError, AssertionError):  # pragma: no cover
    mlflow = None


def callbacks(instance):
    if mlflow is None:
        return {}

    def on_train_start(trainer):
        uri = os.environ.get("MLFLOW_TRACKING_URI")
        if uri:
            mlflow.set_tracking_uri(uri)
        mlflow.set_experiment(
            os.environ.get("MLFLOW_EXPERIMENT_NAME")
            or str(getattr(trainer.args, "project", None) or "YOLO-polar-tpu")
        )
        if mlflow.active_run() is None:
            mlflow.start_run(
                run_name=str(getattr(trainer.args, "name", None) or trainer.save_dir.name)
            )
        mlflow.log_params(
            {k: str(v) for k, v in vars(trainer.args).items() if not callable(v)}
        )

    def on_fit_epoch_end(trainer):
        if mlflow.active_run() is None:
            return
        row = {**getattr(trainer, "label_loss_items", {}), **trainer.metrics}
        mlflow.log_metrics(
            {
                k.replace("(", "_").replace(")", "_").replace("/", "_"): float(v)
                for k, v in row.items()
                if isinstance(v, (int, float))
            },
            step=getattr(trainer, "epoch", 0) + 1,
        )

    def on_train_end(trainer):
        if mlflow.active_run() is None:
            return
        for f in ("best.ckpt", "last.ckpt"):
            p = trainer.wdir / f
            if p.exists():
                mlflow.log_artifact(str(p))
        mlflow.end_run()
        LOGGER.info("mlflow run finished")

    return {
        "on_train_start": on_train_start,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_train_end": on_train_end,
    }
