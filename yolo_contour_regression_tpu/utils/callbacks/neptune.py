"""NeptuneAI sink (reference utils/callbacks/neptune.py): run init at train
start, per-epoch scalar appends, val/train image uploads, final plots + best
checkpoint at train end. Attaches only when ``neptune`` is importable."""
from __future__ import annotations

from .. import LOGGER

try:
    import neptune

    assert hasattr(neptune, "__version__")
except (ImportError, AssertionError):  # pragma: no cover
    neptune = None

_PLOT_FILES = (
    "results.png",
    "confusion_matrix.png",
    "confusion_matrix_normalized.png",
    "F1_curve.png",
    "PR_curve.png",
    "P_curve.png",
    "R_curve.png",
)


def callbacks(instance):
    if neptune is None:
        return {}
    state = {"run": None}

    def on_train_start(trainer):
        try:
            state["run"] = neptune.init_run(
                project=str(getattr(trainer.args, "project", None) or "YOLO-polar-tpu"),
                name=str(getattr(trainer.args, "name", None) or trainer.save_dir.name),
                tags=["YOLO-polar-tpu"],
            )
            state["run"]["Configuration/Hyperparameters"] = {
                k: "" if v is None else str(v)
                for k, v in vars(trainer.args).items()
                if not callable(v)
            }
        except Exception as e:
            LOGGER.warning(f"neptune installed but failed to initialize: {e}")

    def on_fit_epoch_end(trainer):
        run = state["run"]
        if run is None:
            return
        step = getattr(trainer, "epoch", 0) + 1
        row = {**getattr(trainer, "label_loss_items", {}), **trainer.metrics}
        for k, v in row.items():
            if isinstance(v, (int, float)):
                run[k].append(value=float(v), step=step)
        if getattr(trainer, "epoch", 0) == 1:
            from neptune.types import File

            for f in sorted(trainer.save_dir.glob("train_batch*.jpg")):
                run[f"Mosaic/{f.stem}"].upload(File(str(f)))

    def on_train_end(trainer):
        run = state["run"]
        if run is None:
            return
        from neptune.types import File

        for f in _PLOT_FILES:
            p = trainer.save_dir / f
            if p.exists():
                run[f"Plots/{p.stem}"].upload(File(str(p)))
        best = trainer.wdir / "best.ckpt"
        if best.exists():
            run[f"weights/{best.name}"].upload(File(str(best)))
        run.stop()
        LOGGER.info("neptune run finished")

    return {
        "on_train_start": on_train_start,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_train_end": on_train_end,
    }
