"""Local-registry hub session (see package docstring)."""
from __future__ import annotations

import json
import time
import uuid
from pathlib import Path
from typing import Dict, Optional

HUB_DIR = Path.home() / ".ycr_hub"


def _key_file() -> Path:
    # late-bound off HUB_DIR so tests can redirect the registry wholesale
    return HUB_DIR / "auth.json"


def login(api_key: str = "") -> bool:
    HUB_DIR.mkdir(parents=True, exist_ok=True)
    _key_file().write_text(json.dumps({"api_key": api_key, "ts": time.time()}))
    return True


def logout():
    if _key_file().exists():
        _key_file().unlink()


class HubSession:
    """Reference HUBTrainingSession surface: heartbeat + metric/ckpt upload."""

    def __init__(self, model_id: Optional[str] = None):
        self.model_id = model_id or uuid.uuid4().hex[:12]
        self.dir = HUB_DIR / self.model_id
        self.dir.mkdir(parents=True, exist_ok=True)
        self.metrics_queue: Dict[int, Dict] = {}
        self.alive = True

    def heartbeat(self):
        (self.dir / "heartbeat").write_text(str(time.time()))

    def upload_metrics(self, epoch: int, metrics: Dict):
        self.metrics_queue[epoch] = metrics
        with open(self.dir / "metrics.jsonl", "a") as fh:
            fh.write(json.dumps({"epoch": epoch, **metrics}) + "\n")
        self.heartbeat()

    def upload_model(self, epoch: int, ckpt_path: str, is_best: bool = False):
        import shutil

        dst = self.dir / ("best.ckpt" if is_best else f"epoch{epoch}.ckpt")
        shutil.copyfile(ckpt_path, dst)
        self.heartbeat()

    def finish(self):
        self.alive = False
        (self.dir / "done").write_text(str(time.time()))
