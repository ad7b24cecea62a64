"""HUB sink (reference utils/callbacks/hub.py): queues per-epoch metrics to
the session, rate-limited checkpoint uploads on save, final model at train
end. Wired to the local-registry HubSession (hub/session.py) when the trainer
carries one (set ``trainer.hub_session``); a no-op otherwise — the same
contract as the reference, whose sink checks ``getattr(trainer, 'hub_session',
None)`` (reference hub.py:12)."""
from __future__ import annotations

import json
import time

from .. import LOGGER

_RATE_LIMIT_CKPT = 900.0  # seconds between checkpoint uploads (reference: 900)
_RATE_LIMIT_METRICS = 3.0  # reference hub.py rate_limits['metrics']


def callbacks(instance):
    # No attach-time gate: a session attached to the trainer AFTER
    # add_integration_callbacks (the reference's supported flow) must still
    # upload — each handler already no-ops when trainer.hub_session is None.
    state = {"t_ckpt": 0.0, "t_metrics": 0.0}

    def on_fit_epoch_end(trainer):
        session = getattr(trainer, "hub_session", None)
        if session is None:
            return
        row = {**getattr(trainer, "label_loss_items", {}), **trainer.metrics}
        epoch = getattr(trainer, "epoch", 0)
        session.metrics_queue[epoch] = {
            k: float(v) for k, v in row.items() if isinstance(v, (int, float))
        }
        if time.time() - state["t_metrics"] > _RATE_LIMIT_METRICS:
            session.upload_metrics(epoch, session.metrics_queue[epoch])
            state["t_metrics"] = time.time()

    def on_model_save(trainer):
        session = getattr(trainer, "hub_session", None)
        if session is None:
            return
        if time.time() - state["t_ckpt"] > _RATE_LIMIT_CKPT:
            last = trainer.wdir / "last.ckpt"
            if last.exists():
                session.upload_model(
                    getattr(trainer, "epoch", 0), str(last),
                    is_best=getattr(trainer, "best_fitness", None)
                    == getattr(trainer, "fitness", None),
                )
                state["t_ckpt"] = time.time()

    def on_train_end(trainer):
        session = getattr(trainer, "hub_session", None)
        if session is None:
            return
        # flush any still-queued metrics, then the final model
        for epoch, row in sorted(session.metrics_queue.items()):
            session.upload_metrics(epoch, row)
        best = trainer.wdir / "best.ckpt"
        if best.exists():
            session.upload_model(getattr(trainer, "epoch", 0), str(best), is_best=True)
        session.finish()
        LOGGER.info(
            f"hub session {session.model_id} complete: "
            f"{json.dumps({'dir': str(session.dir)})}"
        )

    return {
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_model_save": on_model_save,
        "on_train_end": on_train_end,
    }
