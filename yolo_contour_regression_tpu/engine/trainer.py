"""Trainer — the mode driver for ``model.train(...)``.

TPU-native re-implementation of the reference ``engine/trainer.py``
BaseTrainer (:37-696). Structural differences (deliberate, SURVEY.md §2.8):

  - No DDP subprocess relaunch / NCCL process groups: ONE process per host, a
    ``jax.sharding.Mesh`` over all chips, params replicated, batch sharded;
    XLA inserts the gradient all-reduce.
  - AMP/GradScaler is replaced by bf16 compute (no loss scaling needed on TPU).
  - Warmup/schedule/EMA/clip live inside the single jitted train step
    (engine/step.py) instead of Python-side per-step mutation.
  - Checkpoints: numpy pytree pickles (utils/checkpoint.py) with the same
    last/best + resume semantics (trainer.py:438,590).

Per-epoch: train steps -> EMA validation (rank-0 semantics: host 0 only) ->
csv metrics -> checkpoint -> early stopping, mirroring trainer.py:299-427.
"""
from __future__ import annotations

import csv as csv_mod
import math
import time
from copy import copy
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg
from ..data.build import build_dataloader, build_yolo_dataset
from ..data.dataset import ClassificationDataset
from ..data.utils import check_cls_dataset, check_det_dataset
from ..nn.tasks import build_model
from ..parallel import shard_batch
from ..utils import LOGGER, colorstr
from ..utils.checkpoint import save_checkpoint, load_checkpoint, strip_optimizer
from ..utils.optim import build_optimizer
from .step import (
    TrainState,
    init_train_state,
    make_multi_train_step,
    make_train_step,
)


def _stack_raw_batches(data_iter, n: int, pad_to: Optional[int] = None):
    """Pull ``n`` batches off the loader and stack them into (n, B, ...)
    arrays — used by both multi-step dispatch (stacked mode) and grad
    accumulation. Instance buckets (data/augment.py collate) can differ
    across batches, so label instance axes are re-padded to the group max.
    Images stack with jnp when they are committed device arrays
    (cache='device'): np.stack would silently read the batch back to host."""
    micro = [next(data_iter) for _ in range(n)]
    imgs = [m.pop("img") for m in micro]
    if "mask_gt" in micro[0]:
        n_max = max(m["mask_gt"].shape[1] for m in micro)
        if pad_to is not None:
            # fixed pad target -> ONE label shape across all groups, so the
            # K-step scanned program compiles once per group size instead of
            # once per instance bucket it happens to hit
            n_max = max(n_max, pad_to)
        for m in micro:
            pad = n_max - m["mask_gt"].shape[1]
            if pad:
                for k in ("cls", "bboxes", "segments", "mask_gt", "keypoints"):
                    if k in m:
                        m[k] = np.pad(
                            m[k], [(0, 0), (0, pad)] + [(0, 0)] * (m[k].ndim - 2)
                        )
    labels = {k: np.stack([m[k] for m in micro]) for k in micro[0]}
    images = (np if isinstance(imgs[0], np.ndarray) else jnp).stack(imgs)
    return images, labels


class EarlyStopping:
    """(reference torch_utils.py:478)."""

    def __init__(self, patience: int = 50):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        return (epoch - self.best_epoch) >= self.patience


class BaseTrainer:
    task = "detect"

    def __init__(self, cfg=None, overrides: Optional[Dict] = None):
        self.args = get_cfg(cfg or {}, overrides or {})
        self.args.task = getattr(self.args, "task", self.task) or self.task
        name = self.args.name or f"{self.args.task}_train"
        project = self.args.project or "runs"
        self.save_dir = Path(project) / name
        i = 1
        while self.save_dir.exists() and not self.args.exist_ok and not self.args.resume:
            self.save_dir = Path(project) / f"{name}{i}"
            i += 1
        self.wdir = self.save_dir / "weights"
        self.csv = self.save_dir / "results.csv"
        self.metrics: Dict[str, float] = {}
        self.best_fitness = 0.0
        self.start_epoch = 0
        self.epoch = 0
        self._resume_ckpt = None
        from ..utils.callbacks import add_integration_callbacks, get_default_callbacks

        self.callbacks = get_default_callbacks()
        if self.args.plots or self.args.verbose:
            add_integration_callbacks(self)
        if self.args.resume:
            self._find_resume()

    def run_callbacks(self, event: str):
        from ..utils.callbacks import run_callbacks

        run_callbacks(self, event)

    # -- dataset / model hooks (overridden per task) -----------------------
    def get_data(self):
        return check_det_dataset(self.args.data)

    def get_dataset(self, data, mode: str):
        cfg = copy(self.args)
        return build_yolo_dataset(cfg, data[mode], self.args.batch, data, mode=mode)

    def get_validator(self):
        from .validator import DetectionValidator

        return DetectionValidator(args=copy(self.args))

    def _find_resume(self):
        last = self.save_dir / "weights" / "last.ckpt"
        if isinstance(self.args.resume, str):
            last = Path(self.args.resume)
        if last.exists():
            self._resume_ckpt = load_checkpoint(last)
            for k, v in self._resume_ckpt["train_args"].items():
                if k not in ("resume", "epochs"):
                    setattr(self.args, k, v)
            self.start_epoch = self._resume_ckpt["epoch"] + 1
            self.best_fitness = self._resume_ckpt["best_fitness"]
            LOGGER.info(f"resuming from {last} at epoch {self.start_epoch}")

    # -- the loop ----------------------------------------------------------
    def train(self):
        args = self.args
        data = self.get_data()
        self.data = data
        nc = data["nc"]
        args.nc = nc

        model_cfg = args.model or "yolov8n-seg.yaml"
        if self._resume_ckpt is not None:
            model_cfg = self._resume_ckpt["model_yaml"]
        if args.task == "pose" and data.get("kpt_shape"):
            # dataset keypoint shape overrides the model yaml's (reference
            # models/yolo/pose/train.py:36 data_kpt_shape)
            from ..nn.tasks import yaml_model_load

            if isinstance(model_cfg, (str, Path)):
                model_cfg = yaml_model_load(model_cfg)
            model_cfg = dict(model_cfg)
            model_cfg["kpt_shape"] = [int(v) for v in data["kpt_shape"]]
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if args.amp else jnp.float32
        self.model = build_model(model_cfg, task=args.task, nc=nc, dtype=dtype)
        self.model.names = data["names"]
        variables = self.model.init(
            jax.random.PRNGKey(args.seed), imgsz=args.imgsz
        )
        if self._resume_ckpt is not None:
            variables = {
                "params": self._resume_ckpt["params"],
                "batch_stats": self._resume_ckpt["batch_stats"],
            }

        train_set = self.get_dataset(data, "train")
        if args.plots and jax.process_index() == 0 and hasattr(train_set, "labels"):
            # label-distribution plots before training (reference
            # trainer.py:~280 plot_training_labels -> plotting.py:266)
            from ..utils.plotting import plot_labels

            try:
                all_cls = np.concatenate(
                    [lab["cls"].reshape(-1) for lab in train_set.labels]
                    or [np.zeros(0)]
                )
                all_box = np.concatenate(
                    [lab["bboxes"].reshape(-1, 4) for lab in train_set.labels]
                    or [np.zeros((0, 4))]
                )
                plot_labels(all_cls, all_box, names=data.get("names"),
                            save_dir=self.save_dir)
            except Exception as e:
                LOGGER.warning(f"plot_labels failed: {e}")
        loader = build_dataloader(
            train_set, args.batch, args.workers, shuffle=True, mode="train",
            seed=args.seed,
        )
        # grad accumulation toward nominal batch nbs (reference trainer.py:253),
        # capped at one epoch's worth of loader batches so tiny datasets don't
        # inflate per-epoch work; steps_per_epoch counts OPTIMIZER steps
        micro_per_epoch = max(len(loader), 1)
        accumulate = min(max(round(args.nbs / args.batch), 1), micro_per_epoch)
        args.accumulate = accumulate
        steps_per_epoch = max(micro_per_epoch // accumulate, 1)
        iterations = steps_per_epoch * args.epochs

        tx = build_optimizer(variables["params"], args, steps_per_epoch, iterations)
        state = init_train_state(variables, tx)
        if self._resume_ckpt is not None and self._resume_ckpt.get("opt_state") is not None:
            state = state._replace(
                opt_state=jax.tree_util.tree_map(
                    lambda s, r: jnp.asarray(r) if r is not None else s,
                    state.opt_state, self._resume_ckpt["opt_state"],
                ),
                ema_params=self._resume_ckpt["ema_params"],
                step=jnp.asarray(self._resume_ckpt["step"], jnp.int32),
            )

        # mesh (parallel/mesh.py, shared with the driver dryrun): 1-D
        # data-parallel by default; args.tp > 1 adds a 'model' axis that
        # shards conv output channels (tensor parallelism via GSPMD)
        from ..parallel.mesh import build_train_mesh, place_train_state

        devices = jax.devices()
        tp = int(getattr(args, "tp", 1) or 1)
        mesh = build_train_mesh(devices, args.batch, tp=tp)
        n_used = len(mesh.devices.flatten())
        if n_used < len(devices):
            LOGGER.warning(
                f"batch {args.batch} / tp {tp} uses {n_used} of "
                f"{len(devices)} device(s)"
            )
        state = place_train_state(mesh, state)

        # device-side augmentation (data/device_augment.py): the dataset is
        # in raw mode (decode+letterbox only) and mosaic/warp/mixup/HSV/flips
        # fold into the jitted train step
        raw_mode = bool(getattr(train_set, "device_augment", False))
        aug_fn = None
        if raw_mode:
            from ..data.device_augment import make_augment_fn

            if args.task == "pose" and data.get("flip_idx"):
                # kpt left/right pairing for fliplr (reference augment.py:556)
                args.flip_idx = tuple(data["flip_idx"])
            aug_fn = make_augment_fn(
                args, args.imgsz, getattr(args, "max_instances", 48), mesh=mesh
            )

        def build_step(augment_fn):
            return make_train_step(
                self.model, tx, args, cand=getattr(args, "cand_per_gt", 128),
                accumulate=accumulate, mesh=mesh,
                donate=bool(getattr(args, "donate", True)),
                augment_fn=augment_fn, aug_seed=args.seed,
            )

        # multi-step-per-dispatch (engine/step.py make_multi_train_step):
        # with the image pool in HBM (cache='device') and device-side
        # augmentation, K optimizer steps run as one lax.scan dispatch — the
        # dominant per-step cost on a tunneled-TPU host is the dispatch
        # round-trip (runs/e2e_train_bench.json: ~650 ms dispatch vs ~30 ms
        # step), and this amortizes it K-fold
        from ..data.build import DevicePoolLoader

        spd = getattr(args, "steps_per_dispatch", "auto")
        if spd in ("auto", None, 0, "0", ""):
            K = min(steps_per_epoch, 32)
        else:
            K = max(1, min(int(spd), steps_per_epoch))
        pool_mode = isinstance(loader, DevicePoolLoader)
        if not pool_mode:
            # stacked mode ships (K, B, S, S, 3) uint8 per dispatch — cap the
            # stack at 512 MB of HBM/H2D burst
            batch_bytes = args.batch * args.imgsz * args.imgsz * 3
            K = max(1, min(K, (512 * 1024**2) // max(batch_bytes, 1)))
        multistep = K > 1 and accumulate == 1 and raw_mode
        stack_pad = None
        if multistep and not pool_mode and getattr(train_set, "labels", None):
            # dataset-wide instance bucket: one label shape for every stacked
            # group (see _stack_raw_batches pad_to)
            from ..data.augment import INSTANCE_BUCKETS

            n_act = max(
                (int(np.asarray(lab.get("cls", ())).size)
                 for lab in train_set.labels),
                default=0,
            )
            stack_pad = int(getattr(args, "max_instances", 48))
            for b in INSTANCE_BUCKETS:
                if n_act <= b < stack_pad:
                    stack_pad = b
                    break

        # prebatch augmentation: one vectorized K*B augment per dispatch
        # instead of K in-scan augments. Measured NEUTRAL-to-slightly-slower
        # on chip (runs/e2e_train_r5f.json: 357 vs 370 img/s at b16, 496 vs
        # 504 at b64 — the in-scan augment is only ~4 ms/step, so there was
        # no small-op overhead to amortize), so 'auto' resolves to OFF; the
        # path stays for pool-wide mosaic/mixup partner diversity
        # (prebatch_augment=true). Transient HBM ~= the (K*B, 4, S, S, 3)
        # uint8 tile stack.
        pre_cfg = getattr(args, "prebatch_augment", "auto")
        if isinstance(pre_cfg, str) and pre_cfg.lower() in (
                "true", "false", "1", "0", "yes", "no"):
            pre_cfg = pre_cfg.lower() in ("true", "1", "yes")
        prebatch = bool(pool_mode and pre_cfg is True)

        def build_multi(augment_fn):
            return make_multi_train_step(
                self.model, tx, args, cand=getattr(args, "cand_per_gt", 128),
                mesh=mesh, donate=bool(getattr(args, "donate", True)),
                augment_fn=augment_fn, aug_seed=args.seed,
                from_pool=pool_mode, prebatch_augment=prebatch,
                # labels ride in HBM next to the image pool: per-dispatch
                # host traffic is the (K, B) int32 indices only
                labels_from_pool=pool_mode,
            )

        step_fn = None if multistep else build_step(aug_fn)
        multi_fn = build_multi(aug_fn) if multistep else None
        super_iter = (iter(loader.superbatches(K, idx_only=True))
                      if multistep and pool_mode else None)
        self.used_multistep = bool(multistep)
        self.used_prebatch_augment = bool(multistep and pool_mode and prebatch)
        pool = None
        if multistep:
            LOGGER.info(
                f"multi-step dispatch: {K} optimizer steps per device call "
                f"({'HBM pool gather' if pool_mode else 'stacked uint8 batches'}"
                f"{', prebatch augment' if prebatch else ''})"
            )
            if pool_mode:
                pool = loader.images
                if n_used > 1:
                    # the pool lives on one device after staging; replicate it
                    # across the mesh like params (batch gathers re-shard
                    # inside the scan body). Rebind the loader's reference so
                    # the single-device original is freed — otherwise device 0
                    # carries TWO pool copies (up to 12 GB) all run
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    pool = jax.device_put(pool, NamedSharding(mesh, P()))
                    loader.images = pool
                    loader._label_pool = {
                        k: jax.device_put(v, NamedSharding(mesh, P()))
                        for k, v in loader.label_pool().items()
                    }

        validator = self.get_validator() if args.val else None
        stopper = EarlyStopping(args.patience)
        n_devices = len(mesh.devices.flatten())
        LOGGER.info(
            colorstr("bold", f"train: {len(train_set)} imgs, {steps_per_epoch} steps/epoch, "
                     f"{n_devices} chip(s), batch {args.batch}, imgsz {args.imgsz}")
        )

        close_mosaic_at = args.epochs - args.close_mosaic
        data_iter = iter(loader)
        t_train = time.time()
        self.run_callbacks("on_train_start")
        first_batch_plotted = False
        for epoch in range(self.start_epoch, args.epochs):
            self.epoch = epoch
            self.run_callbacks("on_train_epoch_start")
            if epoch == close_mosaic_at and hasattr(train_set, "close_mosaic"):
                LOGGER.info("closing mosaic augmentation")
                train_set.close_mosaic()
                if raw_mode:
                    # device pipeline: swap to a no-mosaic/no-mixup aug fn
                    # (one extra compile, reference trainer.py:304 semantics)
                    from copy import copy as _copy

                    from ..data.device_augment import make_augment_fn

                    hyp_nm = _copy(args)
                    hyp_nm.mosaic = 0.0
                    hyp_nm.mixup = 0.0
                    aug_nm = make_augment_fn(
                        hyp_nm, args.imgsz,
                        getattr(args, "max_instances", 48), mesh=mesh,
                    )
                    if multistep:
                        multi_fn = build_multi(aug_nm)
                    else:
                        step_fn = build_step(aug_nm)
            epoch_metrics: Dict[str, float] = {}
            t0 = time.time()
            if multistep:
                done = 0
                while done < steps_per_epoch:
                    if pool_mode:
                        idxs, _ = next(super_iter)
                        labels = loader.label_pool()
                        kk = idxs.shape[0]
                    else:
                        kk = min(K, steps_per_epoch - done)
                        images_s, labels = _stack_raw_batches(
                            data_iter, kk, pad_to=stack_pad
                        )
                    if args.plots and not first_batch_plotted and args.task != "classify":
                        from ..utils.plotting import plot_images

                        if pool_mode:
                            pimg = np.asarray(loader.images[jnp.asarray(idxs[0])])
                            plot_lab = loader._stack_labels(
                                [int(j) for j in idxs[0]]
                            )
                        else:
                            pimg = np.asarray(images_s[0])
                            plot_lab = {k: v[0] for k, v in labels.items()}
                        pimg = pimg[..., ::-1].astype(np.float32) / 255.0
                        plot_images(
                            pimg, plot_lab,
                            fname=str(self.save_dir / "train_batch0.jpg"),
                            names=data.get("names"),
                        )
                        first_batch_plotted = True
                    if pool_mode:
                        state, smetrics = multi_fn(state, pool, idxs, labels)
                    else:
                        state, smetrics = multi_fn(state, images_s, labels)
                    done += kk
                    # per-dispatch divergence check (the per-step loop checks
                    # every 50 steps; here one host sync per K steps is cheap
                    # next to the dispatch itself)
                    losses = np.asarray(smetrics["loss"])
                    if not np.isfinite(losses).all():
                        raise FloatingPointError(
                            f"non-finite loss at epoch {epoch} steps "
                            f"{done - kk}..{done}: {losses.tolist()}"
                        )
                epoch_metrics = {k: float(np.asarray(v)[-1]) for k, v in smetrics.items()}
                dt = time.time() - t0
                log = {f"train/{k}": v for k, v in epoch_metrics.items()}
                LOGGER.info(
                    f"epoch {epoch + 1}/{args.epochs}  "
                    + "  ".join(f"{k.split('/')[-1]} {v:.3f}" for k, v in log.items())
                    + f"  ({dt:.1f}s)"
                )
                fitness = self._epoch_tail(state, epoch, log, validator, data)
                if stopper(epoch, fitness):
                    LOGGER.info(
                        f"early stopping at epoch {epoch + 1} (patience {args.patience})"
                    )
                    self._save_on_stop(state, epoch, fitness)
                    break
                continue
            for i in range(steps_per_epoch):
                if accumulate > 1:
                    images, batch = _stack_raw_batches(data_iter, accumulate)
                    pbatch = {k: v[0] for k, v in batch.items()}
                    pimg = images[0]
                else:
                    batch = next(data_iter)
                    images = batch.pop("img")
                    pbatch, pimg = batch, images
                if args.plots and not first_batch_plotted and args.task != "classify":
                    from ..utils.plotting import plot_images

                    # device-pool batches arrive as jax arrays; cv2 needs numpy
                    pimg = np.asarray(pimg)
                    if pimg.dtype == np.uint8:  # raw device-aug batch: BGR u8
                        pimg = pimg[..., ::-1].astype(np.float32) / 255.0
                    plot_images(
                        pimg, pbatch,
                        fname=str(self.save_dir / "train_batch0.jpg"),
                        names=data.get("names"),
                    )
                    first_batch_plotted = True
                if accumulate > 1:
                    from ..parallel.mesh import shard_microbatches

                    images_d = shard_microbatches(mesh, images)
                    batch_d = shard_microbatches(mesh, batch)
                else:
                    images_d = shard_batch(mesh, images)
                    batch_d = shard_batch(mesh, batch)
                state, metrics = step_fn(state, images_d, batch_d)
                if i == steps_per_epoch - 1 or (i % 50 == 0):
                    # sparse host readbacks: each float() forces a device sync
                    # (~30ms RTT through the TPU tunnel), so don't do it per step
                    host = {k: float(v) for k, v in metrics.items()}
                    epoch_metrics = host
                    if not math.isfinite(host["loss"]):
                        raise FloatingPointError(f"non-finite loss at epoch {epoch} step {i}: {host}")
            dt = time.time() - t0
            log = {f"train/{k}": v for k, v in epoch_metrics.items()}
            LOGGER.info(
                f"epoch {epoch + 1}/{args.epochs}  "
                + "  ".join(f"{k.split('/')[-1]} {v:.3f}" for k, v in log.items())
                + f"  ({dt:.1f}s)"
            )

            fitness = self._epoch_tail(state, epoch, log, validator, data)
            if stopper(epoch, fitness):
                LOGGER.info(f"early stopping at epoch {epoch + 1} (patience {args.patience})")
                self._save_on_stop(state, epoch, fitness)
                break

        if hasattr(self, "_saver"):
            self._saver.wait()  # drain the async save before reading ckpts
        self.run_callbacks("on_train_end")
        if args.plots and self.csv.exists():
            from ..utils.plotting import plot_results

            plot_results(str(self.csv))
        LOGGER.info(f"training done in {(time.time() - t_train) / 3600:.3f} h")
        if args.save and (self.wdir / "best.ckpt").exists():
            strip_optimizer(self.wdir / "best.ckpt")
            strip_optimizer(self.wdir / "last.ckpt")
            if validator is not None and jax.process_index() == 0:
                # final_eval (reference trainer.py:579): re-validate the
                # stripped best checkpoint so the returned metrics describe
                # best.ckpt, not the last epoch's EMA
                best = load_checkpoint(self.wdir / "best.ckpt")
                LOGGER.info("final eval of best.ckpt")
                self.metrics = validator(
                    model=self.model,
                    variables={
                        "params": best["params"],
                        "batch_stats": best["batch_stats"],
                    },
                    data=data,
                )
        self.state = state
        return self.metrics

    def _epoch_tail(self, state, epoch, log, validator, data) -> float:
        """EMA validation -> fitness broadcast -> csv -> checkpoint; returns
        this epoch's fitness (reference trainer.py:399-427)."""
        fitness = 0.0
        if validator is not None and jax.process_index() == 0:
            eval_vars = {
                "params": state.ema_params,
                "batch_stats": state.batch_stats,
            }
            vm = validator(model=self.model, variables=eval_vars, data=data)
            log.update(vm)
            fitness = vm.get("fitness", 0.0)
            self.metrics = vm
        if jax.process_count() > 1:
            # broadcast host-0 fitness so every process takes the same
            # early-stop decision (reference trainer.py:420-427
            # broadcast_object_list); without this non-zero hosts see
            # fitness=0 forever and their stopper fires after `patience`
            from jax.experimental import multihost_utils

            fitness = float(
                multihost_utils.broadcast_one_to_all(np.float32(fitness))
            )
        if fitness >= self.best_fitness:
            self.best_fitness = fitness
        self._write_csv(epoch, log)
        self.label_loss_items = {k: v for k, v in log.items() if k.startswith("train/")}
        self.run_callbacks("on_fit_epoch_end")
        if self.args.save and jax.process_index() == 0:
            # checkpoint cadence: every epoch by default (reference parity,
            # trainer.py:404 save_model), but on tunneled-TPU hosts the
            # device->host state readback (params+EMA+opt_state) can cost
            # many times the epoch itself, so `save_last_every` thins the
            # last.ckpt cadence. Real fitness improvements and the final
            # epoch always save — best.ckpt never goes stale.
            every = max(1, int(getattr(self.args, "save_last_every", 1) or 1))
            improved = fitness >= self.best_fitness and fitness > 0
            periodic = self.args.save_period > 0 and (epoch + 1) % self.args.save_period == 0
            if (improved or periodic or (epoch + 1) % every == 0
                    or epoch + 1 == self.args.epochs):
                self._save(state, epoch, fitness)
                self._last_saved_epoch = epoch
                self.run_callbacks("on_model_save")
        return fitness

    def _save_on_stop(self, state, epoch: int, fitness: float):
        """Early stopping can break on an off-cadence epoch — last.ckpt must
        hold the stopping state, not one up to `save_last_every` epochs
        stale (resume/strip read it)."""
        if self.args.save and jax.process_index() == 0 \
                and getattr(self, "_last_saved_epoch", -1) != epoch:
            self._save(state, epoch, fitness)
            self._last_saved_epoch = epoch
            self.run_callbacks("on_model_save")

    def _save(self, state: TrainState, epoch: int, fitness: float):
        trees = dict(
            params=state.params,
            batch_stats=state.batch_stats,
            ema_params=state.ema_params,
            opt_state=state.opt_state,
        )
        host_kw = dict(
            step=int(state.step),
            epoch=epoch,
            best_fitness=self.best_fitness,
            train_args={k: v for k, v in vars(self.args).items() if not callable(v)},
            model_yaml=self.model.yaml,
            names=self.model.names,
        )
        paths = [self.wdir / "last.ckpt"]
        if fitness >= self.best_fitness:
            paths.append(self.wdir / "best.ckpt")
        if self.args.save_period > 0 and (epoch + 1) % self.args.save_period == 0:
            paths.append(self.wdir / f"epoch{epoch + 1}.ckpt")
        if getattr(self.args, "async_save", True):
            # overlap the device->host readback with the next epoch
            # (utils/checkpoint.py AsyncCheckpointSaver)
            if not hasattr(self, "_saver"):
                from ..utils.checkpoint import AsyncCheckpointSaver

                self._saver = AsyncCheckpointSaver()
            self._saver.submit(paths, trees, host_kw)
        else:
            for p in paths:
                save_checkpoint(p, **trees, **host_kw)

    def _write_csv(self, epoch: int, metrics: Dict[str, float]):
        self.csv.parent.mkdir(parents=True, exist_ok=True)
        exists = self.csv.exists()
        with open(self.csv, "a", newline="") as fh:
            w = csv_mod.writer(fh)
            if not exists:
                w.writerow(["epoch"] + list(metrics.keys()))
            w.writerow([epoch] + [f"{v:.5f}" for v in metrics.values()])


class SegmentationTrainer(BaseTrainer):
    """(reference models/yolo/segment/train.py:12)."""

    task = "segment"

    def get_validator(self):
        from .validator import SegmentationValidator

        return SegmentationValidator(args=copy(self.args))


class SegmentationOriTrainer(BaseTrainer):
    """Stock proto-mask segmentation (reference models/yolo/segment_ori/train.py)."""

    task = "segment_ori"

    def get_validator(self):
        from .validator import SegmentationOriValidator

        return SegmentationOriValidator(args=copy(self.args))


class DetectionTrainer(BaseTrainer):
    task = "detect"


class PoseTrainer(BaseTrainer):
    task = "pose"

    def get_validator(self):
        from .validator import PoseValidator

        return PoseValidator(args=copy(self.args))


class ClassificationTrainer(BaseTrainer):
    """(reference models/yolo/classify/train.py)."""

    task = "classify"

    def get_data(self):
        return check_cls_dataset(self.args.data)

    def get_dataset(self, data, mode: str):
        return ClassificationDataset(
            data[mode], imgsz=self.args.imgsz, augment=mode == "train",
            seed=self.args.seed,
        )

    def get_validator(self):
        from .validator import ClassificationValidator

        return ClassificationValidator(args=copy(self.args))
