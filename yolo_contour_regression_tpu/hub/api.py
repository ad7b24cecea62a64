"""HUB module-level API (reference hub/__init__.py:44-130) against the local
run registry: reset_model / export_fmts_hub / export_model / get_export /
check_dataset / start — same call signatures, no SaaS round-trips (the
registry lives in ~/.ycr_hub, see session.py)."""
from __future__ import annotations

from pathlib import Path

from ..engine.exporter import EXPORT_FORMATS
from ..utils import LOGGER
from .session import HUB_DIR

PREFIX = "hub: "


def start(key: str = ""):
    """Deprecated starter (reference hub/__init__.py:44) — points at the
    login + YOLO(...).train() flow."""
    LOGGER.warning(
        f"{PREFIX}start() is deprecated; use:\n"
        "  from yolo_contour_regression_tpu import YOLO\n"
        "  from yolo_contour_regression_tpu.hub import login\n"
        "  login('<api_key>'); YOLO('<model>').train(...)"
    )


def reset_model(model_id: str = ""):
    """Reset a registry model to an untrained state (reference :63):
    removes uploaded metrics/checkpoints, keeps the run id."""
    if not str(model_id).strip():
        # '' would resolve to HUB_DIR itself and wipe the whole registry
        raise ValueError(f"{PREFIX}reset_model() requires a non-empty model_id")
    d = HUB_DIR / model_id
    if not d.exists():
        LOGGER.warning(f"{PREFIX}model '{model_id}' not in local registry {HUB_DIR}")
        return
    for f in d.iterdir():
        if f.is_file():
            f.unlink()
    LOGGER.info(f"{PREFIX}model {model_id} reset successfully")


def export_fmts_hub():
    """Export formats the hub supports (reference :72)."""
    return list(EXPORT_FORMATS)


def export_model(model_id: str = "", format: str = "stablehlo"):
    """Export a registry model's best checkpoint (reference :78, which only
    POSTs a job; here the export actually runs)."""
    assert format in export_fmts_hub(), (
        f"Unsupported export format '{format}', valid formats are {export_fmts_hub()}"
    )
    ckpt = HUB_DIR / model_id / "best.ckpt"
    if not ckpt.exists():
        raise FileNotFoundError(
            f"{PREFIX}no best.ckpt uploaded for model '{model_id}' in {HUB_DIR}"
        )
    from ..engine.model import YOLO

    m = YOLO(str(ckpt))
    path = m.export(format=format, project=str(HUB_DIR / model_id / "exports"))
    LOGGER.info(f"{PREFIX}{format} export complete: {path}")
    return path


def get_export(model_id: str = "", format: str = "stablehlo"):
    """Exported-artifact record with its local 'url' (reference :88)."""
    assert format in export_fmts_hub()
    exp_dir = HUB_DIR / model_id / "exports"
    hits = sorted(exp_dir.rglob(f"*.{format}*")) if exp_dir.exists() else []
    if format == "saved_model":
        hits = [p for p in exp_dir.glob("*") if p.is_dir()] if exp_dir.exists() else []
    if not hits:
        raise FileNotFoundError(
            f"{PREFIX}no {format} export for '{model_id}'; run export_model first"
        )
    return {"url": str(hits[0]), "format": format, "model_id": model_id}


def check_dataset(path: str = "", task: str = "detect"):
    """Error-check a dataset zip before registry upload (reference :100):
    unzips, loads the yaml, and validates splits/names for the task."""
    from ..data.utils import check_cls_dataset, check_det_dataset
    from ..utils.downloads import unzip_file

    p = Path(path)
    root = unzip_file(p, path=p.parent) if p.suffix == ".zip" else p
    if task == "classify":
        stats = check_cls_dataset(str(root))
    else:
        yamls = sorted(Path(root).rglob("*.yaml")) + sorted(Path(root).rglob("*.yml"))
        if not yamls:
            raise FileNotFoundError(f"no data.yaml inside {path}")
        stats = check_det_dataset(str(yamls[0]))
        if task in ("segment", "pose"):
            # the split must actually resolve for the task's trainer
            assert stats.get("val"), f"dataset has no val split for task {task}"
    LOGGER.info(f"{PREFIX}dataset checks passed ✅ ({path})")
    return stats
