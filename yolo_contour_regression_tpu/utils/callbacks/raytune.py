"""Ray Tune sink (reference utils/callbacks/raytune.py): reports the epoch's
metrics to the active Tune session so schedulers (ASHA etc.) can act on them.
Attaches only when ``ray`` is importable (also the backend utils/tuner.py uses
when present)."""
from __future__ import annotations

try:
    import ray
    from ray import tune  # noqa: F401

    assert hasattr(ray, "__version__")
except (ImportError, AssertionError):  # pragma: no cover
    ray = None


def callbacks(instance):
    if ray is None:
        return {}

    def on_fit_epoch_end(trainer):
        try:
            from ray.air import session

            if not ray.tune.is_session_enabled():
                return
        except Exception:
            return
        metrics = {
            k: float(v) for k, v in trainer.metrics.items()
            if isinstance(v, (int, float))
        }
        metrics["epoch"] = getattr(trainer, "epoch", 0)
        session.report(metrics)

    return {"on_fit_epoch_end": on_fit_epoch_end}
