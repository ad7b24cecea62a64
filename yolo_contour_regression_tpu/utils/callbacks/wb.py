"""Weights & Biases sink (reference utils/callbacks/wb.py): run init on train
start, per-epoch metric logging, artifact upload of best/last at train end.
Attaches only when the ``wandb`` package is importable and logged in, exactly
like the reference's try-import gating."""
from __future__ import annotations

from .. import LOGGER

try:
    import wandb

    assert hasattr(wandb, "__version__")
except (ImportError, AssertionError):  # pragma: no cover
    wandb = None


def callbacks(instance):
    if wandb is None:
        return {}

    def on_train_start(trainer):
        if wandb.run is None:
            wandb.init(
                project=str(getattr(trainer.args, "project", None) or "YOLO-polar-tpu"),
                name=str(getattr(trainer.args, "name", None) or trainer.save_dir.name),
                config={k: v for k, v in vars(trainer.args).items() if not callable(v)},
            )

    def on_fit_epoch_end(trainer):
        if wandb.run is None:
            return
        row = {**getattr(trainer, "label_loss_items", {}), **trainer.metrics}
        wandb.run.log(
            {k: v for k, v in row.items() if isinstance(v, (int, float))},
            step=getattr(trainer, "epoch", 0) + 1,
        )

    def on_train_end(trainer):
        if wandb.run is None:
            return
        best = trainer.wdir / "best.ckpt"
        if best.exists():
            art = wandb.Artifact(type="model", name=f"run_{wandb.run.id}_model")
            art.add_file(str(best))
            wandb.run.log_artifact(art, aliases=["best", "last"])
        wandb.run.finish()
        LOGGER.info("wandb run finished")

    return {
        "on_train_start": on_train_start,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_train_end": on_train_end,
    }
