"""Dataloaders — infinite shuffled iteration with background prefetch.

Replaces the reference's ``InfiniteDataLoader`` + worker processes
(data/build.py:22-110): on TPU hosts the augmentation workers are plain
threads (cv2 releases the GIL for the heavy ops) feeding a bounded queue;
batches are dense numpy dicts ready for a single host->device transfer.
``DistributedSampler`` sharding is replaced by per-host slicing of the index
stream (each JAX process consumes its own contiguous shard).
"""
from __future__ import annotations

import queue
import random
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from .augment import collate
from .dataset import ClassificationDataset, YOLODataset


class DataLoader:
    """Infinite (train) or single-pass (val) loader with thread prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        infinite: bool = True,
        workers: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        pad_last: bool = False,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.infinite = infinite
        self.workers = max(1, workers)
        self.rng = random.Random(seed)
        self.drop_last = drop_last
        # pad the final partial batch to batch_size (repeating the last
        # sample) so jitted eval fns see ONE shape and never recompile;
        # consumers read batch["n_valid"] to skip the padding
        self.pad_last = pad_last
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        n = len(self.dataset) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self):
        # rect val: follow the dataset's aspect-sorted order so each batch
        # shares one letterbox shape (data/dataset.py set_rectangle)
        order = getattr(self.dataset, "order", None)
        idx = list(order) if order is not None and not self.shuffle else list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(idx)
        # per-host shard (multi-host data parallelism)
        idx = idx[self.process_index :: self.process_count]
        if self.drop_last:
            idx = idx[: len(idx) - len(idx) % self.batch_size]
        return idx

    def _batches(self) -> Iterator[list]:
        while True:
            idx = self._epoch_indices()
            for i in range(0, len(idx), self.batch_size):
                chunk = idx[i : i + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    break
                yield chunk
            if not self.infinite:
                return

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batch_iter = self._batches()
        q: "queue.Queue" = queue.Queue(maxsize=self.workers * 2)
        stop = threading.Event()
        lock = threading.Lock()

        def qput(item) -> bool:
            """put that never deadlocks an abandoned iterator: producers
            blocked on a full queue would otherwise survive into interpreter
            shutdown (C++ 'terminate called without an active exception')."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            while not stop.is_set():
                with lock:
                    try:
                        chunk = next(batch_iter)
                    except StopIteration:
                        qput(None)
                        return
                try:
                    samples = [self.dataset[j] for j in chunk]
                    b = collate(samples)
                    n = len(samples)
                    if self.pad_last and n < self.batch_size:
                        reps = self.batch_size - n
                        b = {
                            k: np.concatenate([v, np.repeat(v[-1:], reps, axis=0)])
                            for k, v in b.items()
                        }
                    if not self.infinite:  # val: scalar, popped before jit
                        b["n_valid"] = np.int32(n)
                    if not qput(b):
                        return
                except Exception as e:  # surface loader errors to consumer
                    qput(e)
                    return

        threads = [threading.Thread(target=producer, daemon=True) for _ in range(self.workers)]
        for t in threads:
            t.start()
        done_workers = 0
        try:
            while True:
                item = q.get()
                if item is None:
                    # a worker finished; batches it queued earlier are already
                    # ahead of its None in FIFO order, so returning once ALL
                    # workers signalled loses nothing
                    done_workers += 1
                    if done_workers >= self.workers:
                        return
                    continue
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            try:  # unblock any producer sitting in q.put
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            for t in threads:
                t.join(timeout=2.0)


class DevicePoolLoader:
    """``cache='device'``: the image set lives in HBM, batches gather on-device.

    The device-augmentation train path's host output per index (decode +
    letterbox, ``format_sample_raw``) is DETERMINISTIC, so the whole uint8
    image set can be staged on the accelerator once. Each batch is then an
    on-device ``pool[idx]`` gather: the steady-state host->device transfer per
    step is the label dict (KBs), not the image batch (MBs) — on TPU hosts
    where H2D rides a tunnel or a thin PCIe link, a 640px batch-16 upload
    costs more than the train step itself (runs/e2e_train_bench.json).

    Yields the same batch dicts as ``DataLoader`` except ``img`` is already a
    committed device array. Labels are collated on host with the same
    instance-bucketing as the thread loader (``augment.collate``).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, process_index: int = 0, process_count: int = 1,
                 chunk: int = 64):
        import jax
        import jax.numpy as jnp

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = random.Random(seed)
        idxs = list(range(len(dataset)))[process_index::process_count]
        self.labels: list = []
        chunks, buf = [], []
        for i in idxs:
            s = dataset[i]
            buf.append(s.pop("img"))
            self.labels.append(s)
            if len(buf) == chunk:
                chunks.append(jax.device_put(np.stack(buf)))
                buf = []
        if buf:
            chunks.append(jax.device_put(np.stack(buf)))
        self.images = jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
        self._take = jax.jit(lambda pool, idx: pool[idx])

    @staticmethod
    def pool_bytes(dataset) -> int:
        s = int(getattr(dataset, "imgsz", 640))
        return len(dataset) * s * s * 3

    def __len__(self):
        return len(self.labels) // self.batch_size

    def __iter__(self):
        import jax.numpy as jnp

        P = len(self.labels)
        while True:
            order = list(range(P))
            if self.shuffle:
                self.rng.shuffle(order)
            for i in range(0, P - self.batch_size + 1, self.batch_size):
                sel = order[i : i + self.batch_size]
                b = collate([self.labels[j] for j in sel])
                b["img"] = self._take(self.images, jnp.asarray(sel, jnp.int32))
                yield b

    def _instance_cap(self):
        """(n_pad, cap): per-sample instance padding and the dataset-wide
        bucket (smallest of 8/16/32/max covering the busiest image)."""
        from .augment import INSTANCE_BUCKETS

        n_pad = int(self.labels[0]["mask_gt"].shape[0]) if (self.labels and "mask_gt" in self.labels[0]) else 0
        cap = n_pad
        if n_pad:
            n_act = max(
                (int(lab["mask_gt"].sum()) for lab in self.labels), default=0
            )
            for b in INSTANCE_BUCKETS:
                if n_act <= b < n_pad:
                    cap = b
                    break
        return n_pad, cap

    def _stack_labels(self, sel):
        """Collate + dataset-bucket-trim labels for sample indices ``sel``."""
        n_pad, cap = self._instance_cap()
        lab = collate([self.labels[j] for j in sel], bucket_instances=False)
        if cap and cap < n_pad:
            for key in ("cls", "bboxes", "segments", "mask_gt", "keypoints"):
                if key in lab and lab[key].ndim >= 2 and lab[key].shape[1] == n_pad:
                    lab[key] = lab[key][:, :cap]
        return lab

    def label_pool(self):
        """Device-resident label arrays ``{key: (P, ...)}``.

        Like ``self.images``, the per-sample labels are deterministic, so
        they stage into HBM ONCE and per-step batches gather on device —
        on a tunneled-TPU host the per-dispatch H2D of stacked 360-point
        f32 contours (~46 KB/img) otherwise rivals the train step itself
        (runs/train_bench_bucket16.json vs e2e_train_r5f.json: ~14 ms/step
        gap at batch 16 with only ~4 ms of it augmentation). HBM cost is
        ~1/26th of the image pool, so whenever the images fit, labels fit."""
        if getattr(self, "_label_pool", None) is None:
            import jax

            lab = self._stack_labels(list(range(len(self.labels))))
            self._label_pool = {k: jax.device_put(v) for k, v in lab.items()}
        return self._label_pool

    def superbatches(self, k: int, idx_only: bool = False):
        """Yield ``(idxs (kk, B) int32, labels {key: (kk, B, ...)})`` groups
        for the multi-step-per-dispatch train path
        (engine/step.py make_multi_train_step).

        Each epoch emits ``steps // k`` full groups then one remainder group
        (so a consumer chunking ``len(self)`` steps by ``k`` sees matching
        shapes — at most two compiled variants of the K-step scanned train
        program). Labels are collated without per-batch instance bucketing,
        then trimmed to ONE dataset-wide bucket — per-group caps would
        multiply the compile count by up to 4, and each variant is a full
        K-step XLA graph; a global cap keeps the assigner's shape-driven
        cost tight without that.

        ``idx_only=True`` yields ``(idxs, None)`` — for consumers gathering
        labels on device from ``label_pool()`` instead of shipping them
        per dispatch."""
        B = self.batch_size
        P_ = len(self.labels)
        steps = P_ // B
        while True:
            order = list(range(P_))
            if self.shuffle:
                self.rng.shuffle(order)
            sels = [order[i * B : (i + 1) * B] for i in range(steps)]
            groups = [sels[j : j + k] for j in range(0, steps, k)]
            for group in groups:
                if idx_only:
                    yield np.asarray(group, np.int32), None
                    continue
                labs = [self._stack_labels(sel) for sel in group]
                stacked = {key: np.stack([l[key] for l in labs]) for key in labs[0]}
                yield np.asarray(group, np.int32), stacked


def build_yolo_dataset(cfg, img_path, batch: int, data: dict, mode: str = "train"):
    """(reference data/build.py:72 build_yolo_dataset)."""
    augment = mode == "train"
    ds = YOLODataset(
        img_path,
        imgsz=cfg.imgsz,
        augment=augment,
        hyp=cfg,
        max_instances=getattr(cfg, "max_instances", 48),
        use_segments=cfg.task in ("segment", "segment_ori"),
        single_cls=getattr(cfg, "single_cls", False),
        fraction=getattr(cfg, "fraction", 1.0) if mode == "train" else 1.0,
        seed=getattr(cfg, "seed", 0),
        cache_images=getattr(cfg, "cache", False),
        kpt_shape=data.get("kpt_shape") if cfg.task == "pose" else None,
        flip_idx=data.get("flip_idx") if cfg.task == "pose" else None,
        device_augment=use_device_augment(cfg) and augment,
        rect=bool(getattr(cfg, "rect", False)) and mode == "val",
    )
    if ds.rect:
        ds.set_rectangle(batch)
    return ds


def use_device_augment(cfg) -> bool:
    """Device augmentation covers the default train transform chain; the
    host cv2 pipeline remains for the opt-in extras it doesn't implement
    (mosaic9 grids, copy_paste) and for classify (own transform set)."""
    return (
        bool(getattr(cfg, "device_augment", False))
        and getattr(cfg, "task", "detect") in ("detect", "segment", "segment_ori", "pose")
        and float(getattr(cfg, "mosaic9", 0.0) or 0.0) == 0.0
        and float(getattr(cfg, "copy_paste", 0.0) or 0.0) == 0.0
    )


DEVICE_POOL_MAX_BYTES = 6 * 1024**3  # leave HBM headroom for the train step


def build_dataloader(dataset, batch: int, workers: int, shuffle: bool, mode: str = "train", seed: int = 0):
    import jax

    try:
        pidx, pcount = jax.process_index(), jax.process_count()
    except RuntimeError:
        pidx, pcount = 0, 1
    if (
        mode == "train"
        and getattr(dataset, "cache_images", "") == "device"
        and getattr(dataset, "device_augment", False)
    ):
        need = DevicePoolLoader.pool_bytes(dataset)
        if need <= DEVICE_POOL_MAX_BYTES:
            return DevicePoolLoader(
                dataset, batch, shuffle=shuffle, seed=seed,
                process_index=pidx, process_count=pcount,
            )
        from ..utils import LOGGER

        LOGGER.warning(
            f"cache='device': image pool needs {need / 1e9:.1f} GB "
            f"(> {DEVICE_POOL_MAX_BYTES / 1e9:.0f} GB HBM budget) — falling "
            "back to the host thread loader (no cache)"
        )
    elif mode == "train" and getattr(dataset, "cache_images", "") == "device":
        from ..utils import LOGGER

        LOGGER.warning(
            "cache='device' needs the device-augmentation train path "
            "(device_augment=true without mosaic9/copy_paste) — falling back "
            "to the host thread loader (no cache)"
        )
    return DataLoader(
        dataset,
        batch_size=batch,
        shuffle=shuffle,
        infinite=mode == "train",
        workers=workers,
        seed=seed,
        drop_last=mode == "train",
        pad_last=mode != "train",
        process_index=pidx,
        process_count=pcount,
    )
