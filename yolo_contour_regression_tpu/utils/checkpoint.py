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
    deploy: Optional[str] = None,
):
    ckpt = {
        # deploy marker: None (train graph) | 'fused' | 'int8' — loaders wrap
        # the rebuilt model accordingly (nn/fuse.as_deploy_model,
        # nn/quant.as_quantized_model)
        "deploy": deploy,
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
    # atomic write: a crash mid-readback/pickle never corrupts an existing
    # last.ckpt (resume reads it)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(ckpt, fh, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)
    return path


class AsyncCheckpointSaver:
    """Overlap the checkpoint's device->host readback with training.

    ``save_checkpoint`` blocks on a full state readback — tens of MB that
    ride the TPU tunnel on this repo's target deployment, comparable to an
    entire small-dataset epoch (docs/PERF_NOTES.md). ``submit`` instead
    copies the state trees ON-DEVICE (one tiny fused program; the copies are
    immune to the next train step's buffer donation) and hands them to a
    single worker thread that pulls them to host and writes every requested
    path while the next epoch trains. Saves stay ordered: ``submit`` joins
    the previous pending save first; call ``wait()`` before reading the
    files (end of training, strip_optimizer, resume)."""

    def __init__(self):
        self._thread = None
        self._error: Optional[BaseException] = None

    @staticmethod
    @jax.jit
    def _device_copy(trees):
        # a.copy() inside jit lowers to a device-side copy; jit outputs are
        # fresh buffers with the inputs' shardings
        return jax.tree_util.tree_map(lambda a: a.copy(), trees)

    def submit(self, paths, trees, host_kw):
        """paths: list of destination files written from ONE snapshot;
        trees: dict of device pytrees (params/batch_stats/ema_params/
        opt_state); host_kw: the remaining save_checkpoint kwargs."""
        import threading

        self.wait()
        copies = self._device_copy(trees)

        def run():
            try:
                host = {k: _to_numpy(v) for k, v in copies.items()}  # one readback
                for p in paths:
                    save_checkpoint(p, **host, **host_kw)
            except BaseException as e:  # surfaced by the next submit()/wait()
                self._error = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def wait(self):
        """Join the pending save; re-raises any writer-thread failure (a
        silently-lost checkpoint must not look like a successful save)."""
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        if self._error is not None:
            e, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from e


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
