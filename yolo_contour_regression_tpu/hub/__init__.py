"""Ultralytics-HUB-equivalent remote training surface (reference hub/:
auth.py, session.py, utils.py, 674 LoC).

The reference's HUB is a SaaS integration (API-key auth, session heartbeat,
metric upload). This environment has zero egress, so the same surface is
provided against a LOCAL run registry: login() records a key, HubSession
writes heartbeats/metrics to ~/.ycr_hub/<run_id>/ so external tooling can
tail them. The API mirrors hub.login/logout/start + HUBTrainingSession.
"""
from .api import (
    check_dataset,
    export_fmts_hub,
    export_model,
    get_export,
    reset_model,
    start,
)
from .session import HubSession, login, logout

__all__ = [
    "HubSession", "login", "logout", "start", "reset_model",
    "export_fmts_hub", "export_model", "get_export", "check_dataset",
]
