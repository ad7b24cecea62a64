"""The Model facade — ``YOLO('yolov8n-seg.yaml')`` API.

Re-implementation of the reference engine/model.py Model class (:19-462) with
its ``task_map`` indirection (models/yolo/model.py:14-36): construct from a
model yaml (``_new``, model.py:108) or a trained checkpoint (``_load``,
model.py:130), then ``train`` / ``val`` / ``predict`` / ``export`` /
``benchmark`` delegate to the task-specific engine drivers.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Union

import numpy as np

from ..cfg import TASK2MODEL, get_cfg
from ..nn.tasks import build_model, guess_model_task, yaml_model_load
from ..utils import LOGGER
from ..utils.checkpoint import load_checkpoint
from .predictor import (
    BasePredictor,
    ClassificationPredictor,
    PosePredictor,
    SegmentationOriPredictor,
    SegmentationPredictor,
)
from .trainer import (
    BaseTrainer,
    ClassificationTrainer,
    DetectionTrainer,
    PoseTrainer,
    SegmentationOriTrainer,
    SegmentationTrainer,
)
from .validator import (
    ClassificationValidator,
    DetectionValidator,
    PoseValidator,
    SegmentationOriValidator,
    SegmentationValidator,
)

TASK_MAP: Dict[str, Dict[str, Any]] = {
    "detect": {
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": BasePredictor,
    },
    "segment": {
        "trainer": SegmentationTrainer,
        "validator": SegmentationValidator,
        "predictor": SegmentationPredictor,
    },
    "segment_ori": {
        "trainer": SegmentationOriTrainer,
        "validator": SegmentationOriValidator,
        "predictor": SegmentationOriPredictor,
    },
    "classify": {
        "trainer": ClassificationTrainer,
        "validator": ClassificationValidator,
        "predictor": ClassificationPredictor,
    },
    "pose": {
        "trainer": PoseTrainer,
        "validator": PoseValidator,
        "predictor": PosePredictor,
    },
}


def _register_rtdetr():
    from ..models.rtdetr.predict import RTDETRPredictor
    from ..models.rtdetr.val import RTDETRValidator
    from .trainer import BaseTrainer

    class RTDETRTrainer(BaseTrainer):
        task = "rtdetr"

        def get_validator(self):
            from copy import copy

            return RTDETRValidator(args=copy(self.args))

    TASK_MAP["rtdetr"] = {
        "trainer": RTDETRTrainer,
        "validator": RTDETRValidator,
        "predictor": RTDETRPredictor,
    }


_register_rtdetr()


class YOLO:
    """User-facing model handle."""

    def __init__(self, model: Union[str, Path] = "yolov8n-seg.yaml", task: Optional[str] = None):
        model = str(model)
        self.ckpt = None
        self.overrides: Dict[str, Any] = {}
        self._callbacks: Dict[str, list] = {}
        if model.endswith((".yaml", ".yml")):
            self._new(model, task)
        else:
            self._load(model, task)

    def _new(self, cfg_path: str, task: Optional[str]):
        cfg = yaml_model_load(cfg_path)
        self.task = task if task in TASK_MAP else guess_model_task(cfg)
        self.model_cfg = cfg
        self.model = build_model(cfg, task=guess_model_task(cfg))
        self.variables = None
        self.overrides["model"] = cfg_path
        self.overrides["task"] = self.task

    def _load(self, weights: str, task: Optional[str]):
        if not Path(weights).exists():
            # known release assets resolve through the local asset cache
            # (reference engine/model.py via attempt_download_asset)
            from ..utils.downloads import attempt_download_asset

            weights = attempt_download_asset(weights)
        ckpt = load_checkpoint(weights)
        self.ckpt = ckpt
        cfg = ckpt["model_yaml"]
        self.task = task or ckpt["train_args"].get("task") or guess_model_task(cfg)
        self.model_cfg = cfg
        self.model = build_model(cfg, task=guess_model_task(cfg))
        self.model.names = ckpt.get("names", self.model.names)
        deploy = ckpt.get("deploy")
        if deploy == "fused":
            from ..nn.fuse import as_deploy_model

            self.model = as_deploy_model(self.model)
        elif deploy == "int8":
            from ..nn.quant import as_quantized_model

            self.model = as_quantized_model(self.model)
        import jax

        params = ckpt.get("ema_params") or ckpt["params"]
        # fp16 deploy checkpoints (strip_optimizer half=True) upcast on load
        up = lambda x: x.astype(np.float32) if getattr(x, "dtype", None) == np.float16 else x
        params = jax.tree_util.tree_map(up, params)
        bstats = jax.tree_util.tree_map(up, ckpt["batch_stats"])
        self.variables = {"params": params, "batch_stats": bstats}
        self.overrides = {
            k: v
            for k, v in ckpt["train_args"].items()
            if k in ("imgsz", "task", "single_cls", "data")
        }
        self.overrides["model"] = weights

    # ------------------------------------------------------------------
    @property
    def names(self):
        return self.model.names

    def _ensure_variables(self, imgsz: int = 640):
        if self.variables is None:
            self.variables = self.model.init(imgsz=imgsz)
        return self.variables

    def train(self, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "train"}
        trainer_cls = TASK_MAP[self.task]["trainer"]
        self.trainer = trainer_cls(overrides=overrides)
        for event, fns in self._callbacks.items():  # user add_callback hooks
            for fn in fns:
                self.trainer.callbacks.setdefault(event, []).append(fn)
        metrics = self.trainer.train()
        # adopt trained weights
        best = self.trainer.wdir / "best.ckpt"
        last = self.trainer.wdir / "last.ckpt"
        src = best if best.exists() else last
        if src.exists():
            self._load(str(src), self.task)
        return metrics

    def val(self, data: Optional[str] = None, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "val"}
        if data:
            overrides["data"] = data
        args = get_cfg(overrides=overrides)
        validator = TASK_MAP[self.task]["validator"](args=args)
        self._ensure_variables(args.imgsz)
        data_arg = args.data
        return validator(model=self.model, variables=self.variables, data=data_arg)

    def predict(self, source=None, stream: bool = False, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "predict"}
        overrides.setdefault("conf", 0.25)
        args = get_cfg(overrides=overrides)
        args.source = source
        predictor = TASK_MAP[self.task]["predictor"](args=args)
        self._ensure_variables(args.imgsz)
        return predictor(self.model, self.variables, source, names=self.names, stream=stream)

    def __call__(self, source=None, **kwargs):
        return self.predict(source, **kwargs)

    def track(self, source=None, stream: bool = False, tracker: str = "botsort", **kwargs):
        """Predict + multi-object tracking (reference engine/model.py:246
        Model.track wiring trackers/track.py callbacks)."""
        from ..trackers.track import track_results

        kwargs.setdefault("conf", 0.1)  # tracker wants low-conf dets too
        results = self.predict(source, stream=True, **kwargs)
        gen = track_results(results, tracker_type=str(tracker).replace(".yaml", ""))
        return gen if stream else list(gen)

    def export(self, **kwargs):
        from .exporter import Exporter

        overrides = {**self.overrides, **kwargs, "mode": "export"}
        overrides.setdefault("batch", 1)  # export default batch=1 (reference)
        args = get_cfg(overrides=overrides)
        self._ensure_variables(args.imgsz)
        return Exporter(args=args)(self.model, self.variables)

    def benchmark(self, **kwargs):
        from ..utils.benchmarks import benchmark

        return benchmark(self, **kwargs)

    def serve(
        self,
        host: str = "127.0.0.1",
        port: int = 8570,
        imgsz: int = 640,
        max_batch: int = 32,
        max_delay_ms: float = 5.0,
        background: bool = False,
        **kwargs,
    ):
        """Dynamic-batching HTTP inference server (serve/http_api.py) —
        beyond-reference: the reference's deploy story is export + BYO
        server. Blocks in serve_forever unless background=True (then
        returns the httpd; ``httpd.engine`` is the InferenceServer)."""
        from ..serve.http_api import serve_http

        httpd = serve_http(
            self, host=host, port=port, imgsz=imgsz,
            max_batch=max_batch, max_delay_ms=max_delay_ms, **kwargs,
        )
        if background:
            import threading

            threading.Thread(target=httpd.serve_forever, daemon=True).start()
            return httpd
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.shutdown()
            httpd.engine.close()
        return None

    def info(self, detailed: bool = False, imgsz: int = 640):
        n_params = self.model.num_params
        LOGGER.info(
            f"{type(self.model).__name__}: task={self.task}, "
            f"{len(self.model.specs)} layers, {n_params:,} params, "
            f"strides={self.model.strides}"
        )
        out = {"layers": len(self.model.specs), "parameters": n_params}
        if detailed:
            # per-layer table (reference torch_utils.py:172 model_info
            # detailed=True): index, from, module, args, params, out channels
            import numpy as np

            self._ensure_variables(imgsz)
            params = self.variables["params"]
            rows = []
            LOGGER.info(f"{'idx':>4} {'from':>10} {'params':>12}  module")
            for spec in self.model.specs:
                reps = spec.kwargs.get("_repeats", 1)
                n_p = 0
                for r in range(reps):
                    pname = f"layer{spec.i}" + (f"_{r}" if reps > 1 else "")
                    if pname in params:
                        n_p += sum(
                            int(np.prod(leaf.shape))
                            for leaf in __import__("jax").tree_util.tree_leaves(params[pname])
                        )
                kwargs = {k: v for k, v in spec.kwargs.items() if not k.startswith("_")}
                rows.append({
                    "i": spec.i, "from": spec.f, "module": spec.name,
                    "params": n_p, "c2": spec.c2, "kwargs": kwargs,
                })
                LOGGER.info(
                    f"{spec.i:>4} {str(spec.f):>10} {n_p:>12,}  "
                    f"{spec.name}({kwargs})"
                )
            out["layers_detail"] = rows
        return out

    def fuse(self):
        """Structural reparameterization (RepConv/Conv2/Conv+BN) for deploy.

        No-op on an already-fused handle; raises on an int8-quantized one
        (there is no float deploy form to return to — reload the fp32 ckpt)."""
        from ..nn.fuse import fuse_variables

        self._ensure_variables()
        if getattr(self.model, "quantized", False):
            raise RuntimeError(
                "fuse() on an int8-quantized model: quantization is "
                "inference-final; reload the fp32 checkpoint to refuse/retrain"
            )
        self.variables, self.model = fuse_variables(self.model, self.variables)
        return self

    def quantize(self, calib_batches, selective: bool = False):
        """Native w8a8 int8 PTQ for deploy (nn/quant.py): fuses first if
        needed, calibrates input scales on ``calib_batches`` (iterable of
        (B, H, W, 3) float arrays in [0, 1]), and swaps in int8 conv kernels
        that run on the MXU int8 path. Inference-only afterwards.

        ``selective=True`` quantizes only the layers where the on-chip
        micro-bench says the int8 composition beats bf16 (deep/narrow
        layers; nn/quant.py int8_wins). Measured on the v5e scale ladder it
        is throughput-NEUTRAL vs full int8 (runs/bench_int8auto_scales_
        clean.json vs bench_int8_scales.json: equal at s/m/l, ~3% slower at
        n) — keep the full-int8 default for speed; selective's value is
        strictly less quantization error at the same throughput."""
        from ..nn.quant import quantize_variables

        self._ensure_variables()
        if getattr(self.model, "quantized", False):
            raise RuntimeError(
                "quantize() on an already-int8 model would recalibrate scales "
                "from int8 codes (silent corruption); reload the fp32 "
                "checkpoint to re-quantize"
            )
        if not getattr(self.model, "deploy", False):
            self.fuse()
        self.variables, self.model = quantize_variables(
            self.model, self.variables, calib_batches, selective=selective
        )
        return self

    def save(self, path: str = "model.ckpt"):
        """Persist the CURRENT weights — including fused or int8-quantized
        deploy state (reference Model.save; the reference cannot persist its
        fused/quantized forms outside vendor formats). Reloadable via
        ``YOLO(path)``."""
        from ..utils.checkpoint import save_checkpoint

        self._ensure_variables()
        deploy = None
        if getattr(self.model, "quantized", False):
            deploy = "int8"
        elif getattr(self.model, "deploy", False):
            deploy = "fused"
        save_checkpoint(
            path,
            params=self.variables["params"],
            batch_stats=self.variables.get("batch_stats", {}),
            ema_params=None,
            opt_state=None,
            step=0,
            epoch=-1,
            best_fitness=0.0,
            train_args={"task": self.task, **self.overrides},
            model_yaml=self.model_cfg if isinstance(self.model_cfg, dict) else self.model.yaml,
            names=dict(self.names or {}),
            deploy=deploy,
        )
        return path

    # -- reference-facade compatibility (reference engine/model.py) -----------
    def load(self, weights: str):
        """Load weights into the current architecture (reference :178)."""
        self._load(str(weights), self.task)
        return self

    def reset_weights(self):
        """Re-initialize all parameters (reference :165)."""
        self.variables = self.model.init(imgsz=640)
        return self

    def to(self, device=None):
        """Device moves are managed by JAX shardings; identity (reference
        :384 moves the torch module)."""
        return self

    @property
    def device(self):
        import jax

        return jax.devices()[0]

    def tune(self, data: str, iterations: int = 10, epochs: int = 10, **kwargs):
        """Hyperparameter search (reference :394): Ray Tune when installed,
        else the evolutionary Tuner (utils/tuner.py)."""
        try:
            import ray  # noqa: F401

            from ..utils.tuner import run_ray_tune

            return run_ray_tune(self, max_samples=iterations, data=data,
                                epochs=epochs, **kwargs)
        except ImportError:
            from ..utils.tuner import Tuner

            return Tuner(self.overrides.get("model", "yolov8n-seg.yaml"))(
                data, iterations=iterations, epochs=epochs, **kwargs
            )

    def add_callback(self, event: str, func):
        """(reference :423) — callbacks attach to the next trainer built."""
        self._callbacks.setdefault(event, []).append(func)

    def clear_callback(self, event: str):
        self._callbacks.pop(event, None)

    def reset_callbacks(self):
        self._callbacks = {}
