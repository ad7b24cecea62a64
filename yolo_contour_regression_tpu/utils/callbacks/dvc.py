"""DVCLive sink (reference utils/callbacks/dvc.py): Live() at train start,
per-epoch metric logging + next_step, plot images de-duplicated by mtime, best
checkpoint artifact at train end. Attaches only when ``dvclive`` is
importable; disable with ``YCR_DVC_DISABLED=true`` (reference's
ULTRALYTICS_DVC_DISABLED equivalent)."""
from __future__ import annotations

import os

from .. import LOGGER

try:
    import dvclive

    assert hasattr(dvclive, "Live")
except (ImportError, AssertionError):  # pragma: no cover
    dvclive = None


def callbacks(instance):
    if dvclive is None:
        return {}
    state = {"live": None, "plots": {}}

    def _log_plots(live, save_dir, prefix=""):
        for p in sorted(save_dir.glob("*.png")) + sorted(save_dir.glob("*.jpg")):
            ts = p.stat().st_mtime
            if state["plots"].get(p.name) != ts:
                live.log_image(os.path.join(prefix, p.name), str(p))
                state["plots"][p.name] = ts

    def on_train_start(trainer):
        if os.environ.get("YCR_DVC_DISABLED", "false").lower() == "true":
            LOGGER.info("dvclive detected but disabled via YCR_DVC_DISABLED")
            return
        try:
            state["live"] = dvclive.Live(save_dvc_exp=True, cache_images=True)
            state["live"].log_params(
                {k: str(v) for k, v in vars(trainer.args).items() if not callable(v)}
            )
        except Exception as e:
            LOGGER.warning(f"dvclive installed but failed to initialize: {e}")

    def on_fit_epoch_end(trainer):
        live = state["live"]
        if live is None:
            return
        row = {**getattr(trainer, "label_loss_items", {}), **trainer.metrics}
        for k, v in row.items():
            if isinstance(v, (int, float)):
                live.log_metric(k, float(v))
        _log_plots(live, trainer.save_dir, "train")
        live.next_step()

    def on_train_end(trainer):
        live = state["live"]
        if live is None:
            return
        _log_plots(live, trainer.save_dir, "val")
        best = trainer.wdir / "best.ckpt"
        if best.exists():
            live.log_artifact(str(best), copy=True, type="model")
        live.end()
        LOGGER.info("dvclive run finished")

    return {
        "on_train_start": on_train_start,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_train_end": on_train_end,
    }
