"""Sanity checks (reference utils/checks.py, 501 LoC): check_imgsz (:45),
check_version (:93), check_file/check_yaml search (:356-384), print_args —
torch-free; check_requirements' auto-pip is intentionally absent (zero-egress
environment; it raises with instructions instead)."""
from __future__ import annotations

import glob
import math
import re
from pathlib import Path
from typing import List, Optional, Union

from . import LOGGER, colorstr


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, floor: int = 0):
    """Round image size up to a multiple of the max stride
    (reference checks.py:45)."""
    if isinstance(imgsz, int):
        sizes = [imgsz]
    else:
        sizes = list(imgsz)
    new = [max(math.ceil(s / stride) * stride, floor) for s in sizes]
    if new != sizes:
        LOGGER.warning(f"imgsz {sizes} must be multiple of stride {stride}; using {new}")
    if min_dim == 1 and isinstance(imgsz, int):
        return new[0]
    if len(new) == 1:
        return [new[0], new[0]]
    return new


def parse_version(v: str):
    return tuple(int(x) for x in re.findall(r"\d+", str(v))[:3] or [0])


def check_version(current: str, required: str = "0.0.0", name: str = "version",
                  hard: bool = False) -> bool:
    """'>=1.2.3'-style constraint check (reference checks.py:93)."""
    ops = {">=": 0, "<=": 1, "==": 2, ">": 3, "<": 4, "!=": 5}
    m = re.match(r"([<>=!]+)?\s*([\d.]+)", required.strip())
    op = m.group(1) or ">="
    want = parse_version(m.group(2))
    cur = parse_version(current)
    ok = {
        ">=": cur >= want, "<=": cur <= want, "==": cur == want,
        ">": cur > want, "<": cur < want, "!=": cur != want,
    }[op]
    if not ok:
        msg = f"{name}{required} required, found {current}"
        if hard:
            raise ModuleNotFoundError(msg)
        LOGGER.warning(msg)
    return ok


def check_requirements(requirements: Union[str, List[str]]):
    """Verify importability; NO auto-pip in this environment (reference
    checks.py:232 installs missing packages; we refuse with a clear error)."""
    reqs = [requirements] if isinstance(requirements, str) else list(requirements)
    missing = []
    for r in reqs:
        name = re.split(r"[<>=!]", r)[0].strip().replace("-", "_")
        try:
            __import__(name)
        except ImportError:
            missing.append(r)
    if missing:
        raise ImportError(
            f"missing requirements {missing}; this environment disallows "
            "auto-install — add them to the image or gate the feature"
        )
    return True


def check_suffix(file, suffix=(".ckpt",), msg: str = ""):
    if file and suffix:
        sfx = Path(str(file)).suffix.lower()
        allowed = (suffix,) if isinstance(suffix, str) else tuple(suffix)
        assert sfx in allowed, f"{msg}{file} suffix must be one of {allowed}"


def check_file(file, suffix=""):
    """Resolve a file locally: exact path, cwd-relative, then package cfg dirs
    (reference checks.py:356 — minus the download branch)."""
    if not file or (isinstance(file, str) and file.startswith(("http://", "https://"))):
        raise FileNotFoundError(f"cannot fetch remote files in this environment: {file}")
    f = Path(file)
    if f.exists():
        return str(f)
    from ..cfg import CFG_DIR

    for base in (CFG_DIR, CFG_DIR / "models", CFG_DIR / "datasets"):
        cand = base / f.name
        if cand.exists():
            return str(cand)
    hits = glob.glob(f"**/{f.name}", recursive=True)
    if hits:
        return hits[0]
    raise FileNotFoundError(f"'{file}' not found")


def check_yaml(file, suffix=(".yaml", ".yml")):
    return check_file(file)


def print_args(args: Optional[dict] = None):
    s = ", ".join(f"{k}={v}" for k, v in (args or {}).items())
    LOGGER.info(colorstr("args: ") + s)


def check_yolo(verbose: bool = True) -> dict:
    """Environment summary for the `yolo checks` CLI command (reference
    checks.py check_yolo): python/jax versions, device inventory, package
    version. Returns the dict so tests don't have to parse the log."""
    import platform
    import sys

    info = {
        "version": __import__("yolo_contour_regression_tpu").__version__,
        "python": sys.version.split()[0],
        "platform": platform.platform(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["default_backend"] = jax.default_backend()
        info["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:  # device backend unreachable: report, don't crash
        info["jax_error"] = f"{type(e).__name__}: {e}"
    try:
        import flax
        import optax

        info["flax"] = flax.__version__
        info["optax"] = optax.__version__
    except Exception:
        pass
    if verbose:
        for k, v in info.items():
            LOGGER.info(f"{k}: {v}")
    return info
