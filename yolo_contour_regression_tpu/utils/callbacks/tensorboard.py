"""TensorBoard sink via tf.summary (reference callbacks/tensorboard.py —
theirs uses torch.utils.tensorboard; this image ships TF)."""
from __future__ import annotations

from .. import LOGGER

try:
    import tensorflow as tf
except ImportError:  # pragma: no cover
    tf = None

_writers = {}


def _writer(log_dir: str):
    if log_dir not in _writers:
        _writers[log_dir] = tf.summary.create_file_writer(str(log_dir))
    return _writers[log_dir]


def callbacks(instance):
    if tf is None:
        return {}

    def on_fit_epoch_end(trainer):
        w = _writer(str(trainer.save_dir / "tb"))
        step = getattr(trainer, "epoch", 0)
        with w.as_default():
            for k, v in {**getattr(trainer, "label_loss_items", {}), **trainer.metrics}.items():
                try:
                    tf.summary.scalar(k, float(v), step=step)
                except (TypeError, ValueError):
                    pass
            w.flush()

    def on_train_end(trainer):
        for w in _writers.values():
            w.flush()

    return {"on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}
