"""ClearML sink (reference utils/callbacks/clearml.py): Task init at train
start with framework auto-bind disabled (we log manually), per-epoch scalar
reporting, debug-sample images for epoch 1, final plots + output model at
train end. Attaches only when ``clearml`` is importable."""
from __future__ import annotations

import re

from .. import LOGGER

try:
    import clearml
    from clearml import Task

    assert hasattr(clearml, "__version__")
except (ImportError, AssertionError):  # pragma: no cover
    clearml = None
    Task = None

_PLOT_FILES = (
    "results.png",
    "confusion_matrix.png",
    "confusion_matrix_normalized.png",
    "F1_curve.png",
    "PR_curve.png",
    "P_curve.png",
    "R_curve.png",
)


def _log_debug_samples(files, title="Debug Samples"):
    task = Task.current_task()
    if not task:
        return
    for f in files:
        if f.exists():
            it = re.search(r"_batch(\d+)", f.name)
            iteration = int(it.groups()[0]) if it else 0
            task.get_logger().report_image(
                title=title,
                series=f.name.replace(it.group(), "") if it else f.name,
                local_path=str(f),
                iteration=iteration,
            )


def callbacks(instance):
    if clearml is None:
        return {}

    def on_train_start(trainer):
        try:
            task = Task.current_task()
            if task is None:
                task = Task.init(
                    project_name=str(getattr(trainer.args, "project", None) or "YOLO-polar-tpu"),
                    task_name=str(getattr(trainer.args, "name", None) or trainer.save_dir.name),
                    tags=["YOLO-polar-tpu"],
                    output_uri=True,
                    reuse_last_task_id=False,
                    auto_connect_frameworks={"pytorch": False, "matplotlib": False},
                )
            task.connect(
                {k: str(v) for k, v in vars(trainer.args).items() if not callable(v)},
                name="General",
            )
        except Exception as e:
            LOGGER.warning(f"clearml installed but failed to initialize: {e}")

    def on_fit_epoch_end(trainer):
        task = Task.current_task()
        if task is None:
            return
        epoch = getattr(trainer, "epoch", 0)
        if epoch == 1:
            _log_debug_samples(sorted(trainer.save_dir.glob("train_batch*.jpg")), "Mosaic")
        log = task.get_logger()
        row = {**getattr(trainer, "label_loss_items", {}), **trainer.metrics}
        for k, v in row.items():
            if isinstance(v, (int, float)):
                title, _, series = k.rpartition("/")
                log.report_scalar(title or "train", series or k, float(v), iteration=epoch)

    def on_train_end(trainer):
        task = Task.current_task()
        if task is None:
            return
        for f in _PLOT_FILES:
            p = trainer.save_dir / f
            if p.exists():
                task.get_logger().report_image(
                    title=p.stem, series="", local_path=str(p), iteration=0
                )
        for k, v in trainer.metrics.items():
            if isinstance(v, (int, float)):
                task.get_logger().report_single_value(k, float(v))
        best = trainer.wdir / "best.ckpt"
        if best.exists():
            task.update_output_model(
                model_path=str(best),
                model_name=str(getattr(trainer.args, "name", None) or "best"),
                auto_delete_file=False,
            )
        LOGGER.info("clearml task finished")

    return {
        "on_train_start": on_train_start,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_train_end": on_train_end,
    }
