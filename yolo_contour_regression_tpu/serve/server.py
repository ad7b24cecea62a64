"""Dynamic-batching inference server.

TPU-first design notes:

- **Static shape buckets.** Every distinct batch size is a separate XLA
  compilation. The server rounds each formed batch up to the nearest bucket
  (powers of two up to ``max_batch`` by default) and pads with zero images;
  padded rows cost FLOPs but never a recompile, and their outputs are
  dropped before postprocess. ``warmup()`` pre-compiles every bucket so the
  first real request doesn't eat a 20-40s trace.
- **One dispatcher thread owns the device.** JAX dispatch is serialized
  through a single thread: request threads only enqueue numpy images and
  block on futures, so there is never concurrent tracing/execution and the
  server composes with a training process the same way any second jit
  caller would.
- **Coalescing window.** The dispatcher takes the first queued request,
  then keeps draining the queue until ``max_batch`` requests are in hand or
  ``max_delay_ms`` has elapsed since the first one — the standard
  latency/throughput knob (small window = low p50, big window = full
  buckets and peak img/s).

The per-task pre/post math is reused verbatim from the predictor layer
(``engine/predictor.py``): letterbox + BGR->RGB [0,1] in, jitted
model+NMS(+lazy polar finalize) on device, native-space Results out. The
reference has no equivalent component (its predictor streams batch-1;
reference ultralytics/engine/predictor.py:240-300).
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils import LOGGER


def _default_buckets(max_batch: int) -> List[int]:
    """Powers of two up to max_batch (always including max_batch itself)."""
    b, out = 1, []
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return sorted(set(out))


class ServerStats:
    """Rolling serving metrics: request latency quantiles, batch fill, throughput."""

    def __init__(self, window: int = 10000):
        self._lock = threading.Lock()
        self._latencies = deque(maxlen=window)  # seconds, per request
        self.batch_hist: Dict[int, int] = {}  # formed (pre-pad) batch size -> count
        self.requests = 0
        self.batches = 0
        self.padded_rows = 0
        self._t0 = time.perf_counter()

    def record_batch(self, n_real: int, n_padded: int, latencies: Sequence[float]):
        with self._lock:
            self.requests += n_real
            self.batches += 1
            self.padded_rows += n_padded - n_real
            self.batch_hist[n_real] = self.batch_hist.get(n_real, 0) + 1
            self._latencies.extend(latencies)

    def snapshot(self) -> Dict:
        with self._lock:
            lat = np.asarray(self._latencies, np.float64)
            elapsed = time.perf_counter() - self._t0
            out = {
                "requests": self.requests,
                "batches": self.batches,
                "padded_rows": self.padded_rows,
                "batch_hist": dict(sorted(self.batch_hist.items())),
                "elapsed_s": round(elapsed, 3),
                "throughput_rps": round(self.requests / elapsed, 2) if elapsed > 0 else 0.0,
                "mean_batch": round(self.requests / self.batches, 2) if self.batches else 0.0,
            }
            if lat.size:
                out.update(
                    latency_ms_p50=round(float(np.percentile(lat, 50)) * 1e3, 2),
                    latency_ms_p95=round(float(np.percentile(lat, 95)) * 1e3, 2),
                    latency_ms_p99=round(float(np.percentile(lat, 99)) * 1e3, 2),
                )
            return out


class _Request:
    __slots__ = ("image", "future", "t_submit")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.future: Future = Future()
        self.t_submit = time.perf_counter()


class InferenceServer:
    """Dynamic-batching TPU inference server over a YOLO handle.

    Usage::

        srv = InferenceServer("best.ckpt", imgsz=640, max_batch=32)
        srv.start()                  # or: with InferenceServer(...) as srv:
        fut = srv.submit(bgr_image)  # thread-safe, returns a Future[Results]
        res = fut.result()
        srv.infer([im1, im2, im3])   # blocking convenience, list[Results]
        srv.stats()                  # latency/throughput/batch-fill dict
        srv.close()

    Works for every predictor task (detect/segment/segment_ori/pose/
    classify/rtdetr) — pre/post comes from the task's predictor class.
    """

    def __init__(
        self,
        weights,
        imgsz: int = 640,
        max_batch: int = 32,
        max_delay_ms: float = 5.0,
        buckets: Optional[Sequence[int]] = None,
        conf: Optional[float] = None,
        iou: Optional[float] = None,
        fuse: bool = True,
        queue_size: int = 1024,
        mesh=None,
    ):
        from ..engine.model import TASK_MAP, YOLO

        self.handle = weights if isinstance(weights, YOLO) else YOLO(weights)
        self.handle._ensure_variables(imgsz)
        if fuse and not getattr(self.handle.model, "deploy", False):
            self.handle.fuse()
        self.model = self.handle.model
        self.variables = self.handle.variables
        self.names = self.handle.names
        self.imgsz = int(imgsz)
        self.max_batch = int(max_batch)
        self.max_delay = float(max_delay_ms) / 1e3

        # multi-chip data-parallel serving: params replicated over the mesh,
        # each batch dim-0-sharded over the 'batch' axis — XLA GSPMD splits
        # the whole model+NMS graph with zero per-request collectives (the
        # images are independent). Buckets must be multiples of the mesh
        # size so every chip gets identical sub-shapes (no recompiles).
        self.mesh = mesh
        n_dev = 1
        if mesh is not None:
            from ..parallel.mesh import replicate_tree

            n_dev = int(np.prod(list(mesh.shape.values())))
            self.variables = replicate_tree(mesh, self.variables)
            self.max_batch = max(self.max_batch, n_dev)
        raw = set(int(b) for b in (buckets or _default_buckets(self.max_batch)))
        raw.add(self.max_batch)  # capacity bucket, rounded with the rest
        if n_dev > 1:
            raw = {max(n_dev, (b + n_dev - 1) // n_dev * n_dev) for b in raw}
        self.buckets = sorted(raw)

        predictor_cls = TASK_MAP[self.model.task]["predictor"]
        self._predictor = predictor_cls()
        if conf is not None:
            self._predictor.args.conf = conf
        if iou is not None:
            self._predictor.args.iou = iou
        self._predictor.args.imgsz = self.imgsz
        self._eval_fn = self._predictor._build_eval(self.model)

        self._queue: queue.Queue = queue.Queue(maxsize=queue_size)
        self._stats = ServerStats()
        self._thread: Optional[threading.Thread] = None
        self._closing = threading.Event()
        self._last_error: Optional[str] = None  # observability, not a gate

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> "InferenceServer":
        if self._thread is not None:
            return self
        self._closing.clear()  # allow restart after close()
        self._last_error = None
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True, name="serve-dispatch")
        self._thread.start()
        return self

    def _place_input(self, x: np.ndarray):
        """Device placement identical to the dispatch path — jit executables
        are keyed on input shardings, so warmup MUST place inputs exactly
        like live batches or its compiles are never reused."""
        import jax
        import jax.numpy as jnp

        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding

            return jax.device_put(x, batch_sharding(self.mesh, x.ndim))
        return jnp.asarray(x)

    def warmup(self, buckets: Optional[Sequence[int]] = None):
        """Pre-compile the eval graph for each bucket (first trace of the
        full model+NMS takes 20-40s on a tunneled TPU; do it before traffic).
        Warms the exact per-request input dtype (uint8 for letterboxed
        tasks, f32 for classify) — executables are keyed on dtype too."""
        pre = getattr(self._predictor, "preprocess_u8", self._predictor.preprocess)
        x0, _, _ = pre(np.zeros((32, 32, 3), np.uint8), self.imgsz)
        dtype = np.asarray(x0).dtype
        for b in buckets or self.buckets:
            t0 = time.perf_counter()
            x = self._place_input(np.zeros((b,) + np.asarray(x0).shape, dtype))
            out = self._eval_fn(self.variables, x)
            # block on a leaf so compile+execute both finish
            leaf = out["scores"] if isinstance(out, dict) else out
            np.asarray(leaf)
            LOGGER.info(f"serve: warmed bucket {b} in {time.perf_counter() - t0:.1f}s")
        return self

    def close(self, drain: bool = True):
        """Stop the dispatcher. With drain=True (default) queued requests are
        processed first; otherwise they fail with RuntimeError."""
        if self._thread is None:
            return
        self._closing.set()
        if not drain:
            while True:
                try:
                    req = self._queue.get_nowait()
                    req.future.set_exception(RuntimeError("server closed"))
                except queue.Empty:
                    break
        self._queue.put(None)  # sentinel wakes the dispatcher
        self._thread.join()
        self._thread = None
        # a submit() racing close() can enqueue behind the sentinel; fail
        # those futures rather than leaving their callers blocked forever
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not None and not req.future.done():
                req.future.set_exception(RuntimeError("server closed"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    # -- request paths ------------------------------------------------------
    def submit(self, image_bgr: np.ndarray) -> Future:
        """Enqueue one BGR uint8 image (H, W, 3); returns Future[Results]."""
        if self._thread is None or self._closing.is_set():
            raise RuntimeError("server not running (call start(), not after close())")
        req = _Request(np.asarray(image_bgr))
        self._queue.put(req)
        return req.future

    def infer(self, images: Sequence[np.ndarray], timeout: Optional[float] = None):
        """Blocking convenience: submit all, wait for all, return [Results]."""
        futs = [self.submit(im) for im in images]
        return [f.result(timeout=timeout) for f in futs]

    def stats(self) -> Dict:
        s = self._stats.snapshot()
        s["buckets"] = self.buckets
        s["queue_depth"] = self._queue.qsize()
        s["last_error"] = self._last_error
        return s

    def reset_stats(self):
        """Fresh metrics window (e.g. between load-bench phases) — the
        compiled eval graphs and dispatcher are untouched."""
        self._stats = ServerStats()

    # -- dispatcher ---------------------------------------------------------
    def _take_batch(self) -> Optional[List[_Request]]:
        """Block for the first request, then coalesce until max_batch or the
        delay window closes. None = shutdown."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        if first is None:
            return None
        batch = [first]
        deadline = time.perf_counter() + self.max_delay
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # re-post sentinel for the outer loop
                break
            batch.append(nxt)
        return batch

    def _dispatch_loop(self):
        """Form + preprocess + DISPATCH batches only. JAX execution is
        async, so handing the un-synced device output to a completion thread
        pipelines the device/link with host post-work: batch N+1's
        preprocess+upload overlaps batch N's execute+readback+postprocess.
        The bounded hand-off queue (2 in-flight batches) is the
        backpressure that keeps latency from growing without bound."""
        done_q: queue.Queue = queue.Queue(maxsize=2)
        comp = threading.Thread(
            target=self._completion_loop, args=(done_q,), daemon=True,
            name="serve-complete",
        )
        comp.start()
        pre = getattr(self._predictor, "preprocess_u8", self._predictor.preprocess)
        try:
            while True:
                batch = self._take_batch()
                if batch is None or (not batch and self._closing.is_set()):
                    return
                if not batch:
                    continue
                try:
                    # per-request preprocess isolation: one malformed image
                    # must fail only its own future, not everyone coalesced
                    # with it
                    xs, gains, pads, ok = [], [], [], []
                    for req in batch:
                        try:
                            x, gain, pad = pre(req.image, self.imgsz)
                        except Exception as e:
                            req.future.set_exception(e)
                            continue
                        xs.append(x)
                        gains.append(gain)
                        pads.append(pad)
                        ok.append(req)
                    batch = ok
                    if not batch:
                        continue
                    n = len(batch)
                    bucket = next(b for b in self.buckets if b >= n)
                    # uint8 end-to-end (detect/segment/pose/rtdetr): 1 B/px
                    # over the link, normalize fused into the first conv
                    stacked = np.zeros((bucket,) + xs[0].shape, np.asarray(xs[0]).dtype)
                    stacked[:n] = np.stack(xs)
                    out = self._eval_fn(self.variables, self._place_input(stacked))
                    done_q.put((out, batch, gains, pads, bucket))
                except Exception as e:
                    # device/trace failure: fail THIS batch's futures and
                    # keep serving — a transient error must not brick the
                    # server (surfaced in stats()['last_error'])
                    for req in batch:
                        if not req.future.done():
                            req.future.set_exception(e)
                    self._last_error = f"{type(e).__name__}: {e}"
                    LOGGER.error(f"serve: batch failed: {self._last_error}")
        finally:
            done_q.put(None)  # drain: queued batches complete before join
            comp.join()

    def _completion_loop(self, done_q: queue.Queue):
        """Blocks on device readback, then per-request postprocess."""
        while True:
            item = done_q.get()
            if item is None:
                return
            out, batch, gains, pads, bucket = item
            try:
                if isinstance(out, dict):
                    out = {k: np.asarray(v) for k, v in out.items()}
                else:
                    out = np.asarray(out)
                now = time.perf_counter()
                lats = []
                for bi, req in enumerate(batch):
                    try:
                        if self.model.task == "classify":
                            # classify eval returns (B, nc) probs directly
                            from ..engine.results import Results

                            res = Results(req.image, f"request-{bi}", self.names, probs=out[bi])
                        else:
                            # dict (detect/segment/pose NMS output) or raw
                            # array (rtdetr) — each task's postprocess owns it
                            res = self._predictor.postprocess(
                                out, bi, req.image, f"request-{bi}",
                                gains[bi], pads[bi], self.names,
                            )
                        req.future.set_result(res)
                        lats.append(now - req.t_submit)
                    except Exception as e:  # one bad postprocess must not sink the batch
                        req.future.set_exception(e)
                self._stats.record_batch(len(batch), bucket, lats)
            except Exception as e:
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)
                self._last_error = f"{type(e).__name__}: {e}"
                LOGGER.error(f"serve: batch readback failed: {self._last_error}")
            else:
                self._last_error = None
