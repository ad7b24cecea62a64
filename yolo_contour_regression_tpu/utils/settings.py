"""Persisted user settings (reference SettingsManager utils/__init__.py:746):
a versioned JSON at ~/.config/ycr_tpu/settings.json holding datasets/weights/
runs dirs and feature toggles, with reset + corrupt-file recovery."""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

SETTINGS_PATH = Path.home() / ".config" / "ycr_tpu" / "settings.json"

DEFAULTS: Dict[str, Any] = {
    "settings_version": "0.1.0",
    "datasets_dir": str(Path.home() / "datasets"),
    "weights_dir": str(Path.home() / "weights"),
    "runs_dir": "runs",
    "tensorboard": True,
    "sync": False,  # no telemetry in this environment, ever
}


class SettingsManager(dict):
    def __init__(self, path=None):
        super().__init__(DEFAULTS)
        # late-bound module attribute (not a def-time default) so tests can
        # monkeypatch SETTINGS_PATH without touching real user config
        self.path = Path(path or SETTINGS_PATH)
        try:
            if self.path.exists():
                loaded = json.loads(self.path.read_text())
                if loaded.get("settings_version") == DEFAULTS["settings_version"]:
                    self.update(loaded)
                else:  # version bump -> reset, keep dirs
                    for k in ("datasets_dir", "weights_dir", "runs_dir"):
                        if k in loaded:
                            self[k] = loaded[k]
                    self.save()
            else:
                self.save()
        except (json.JSONDecodeError, OSError):
            self.reset()

    def save(self):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(dict(self), indent=2))

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)

    def reset(self):
        self.clear()
        super().update(DEFAULTS)
        self.save()


SETTINGS = None


def get_settings() -> SettingsManager:
    global SETTINGS
    if SETTINGS is None:
        SETTINGS = SettingsManager()
    return SETTINGS
