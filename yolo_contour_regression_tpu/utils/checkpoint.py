"""Checkpoint save/load (reference trainer.py:438 save_model /
tasks.py:553 torch_safe_load + attempt_load_one_weight).

Format: a single pickle of numpy-converted pytrees:
  {epoch, best_fitness, params, batch_stats, ema_params, opt_state, step,
   train_args, model_yaml, names, date, version}
``strip_optimizer`` (torch_utils.py:379) drops opt_state and swaps params for
EMA for deploy-size final checkpoints.
"""
from __future__ import annotations

import pickle
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

__version__ = "0.1.0"


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path,
    params,
    batch_stats,
    ema_params,
    opt_state,
    step,
    epoch: int,
    best_fitness: float,
    train_args: Dict[str, Any],
    model_yaml: Dict[str, Any],
    names: Dict[int, str],
):
    ckpt = {
        "epoch": epoch,
        "best_fitness": best_fitness,
        "params": _to_numpy(params),
        "batch_stats": _to_numpy(batch_stats),
        "ema_params": _to_numpy(ema_params),
        "opt_state": _to_numpy(opt_state),
        "step": int(step),
        "train_args": dict(train_args),
        "model_yaml": dict(model_yaml),
        "names": dict(names),
        "date": datetime.now().isoformat(),
        "version": __version__,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fh:
        pickle.dump(ckpt, fh, protocol=pickle.HIGHEST_PROTOCOL)
    return path


def load_checkpoint(path) -> Dict[str, Any]:
    with open(path, "rb") as fh:
        return pickle.load(fh)


def strip_optimizer(path, out_path: Optional[str] = None, half: bool = False):
    """EMA -> params, drop optimizer state (reference torch_utils.py:379);
    ``half=True`` additionally stores float params as fp16 (the reference's
    .half() deploy checkpoints) — loaders upcast to fp32."""
    ckpt = load_checkpoint(path)
    if ckpt.get("ema_params") is not None:
        ckpt["params"] = ckpt["ema_params"]
    ckpt["ema_params"] = None
    ckpt["opt_state"] = None
    if half:
        cast = lambda x: (
            x.astype(np.float16)
            if isinstance(x, np.ndarray) and x.dtype == np.float32
            else x
        )
        ckpt["params"] = jax.tree_util.tree_map(cast, ckpt["params"])
        ckpt["batch_stats"] = jax.tree_util.tree_map(cast, ckpt["batch_stats"])
    with open(out_path or path, "wb") as fh:
        pickle.dump(ckpt, fh, protocol=pickle.HIGHEST_PROTOCOL)
    return out_path or path
