"""Threaded multi-stream ingestion (reference data/loaders.py:31 LoadStreams).

The reference reads N cameras/RTSP feeds with one daemon thread per stream
(loaders.py:68) and batches the freshest frame from each per step, so live
inference over many sources rides one forward pass instead of N. This is
even more important on TPU than on GPU: a v5e chip's throughput is almost
entirely a function of batch size (bench.py: ~300 img/s at batch 1 vs
~7,500 at batch 128), so N concurrent streams batched per dispatch get
close to N× the per-stream frame rate for free.

TPU-native choices vs the reference:
  - the stream count is FIXED at construction; the predictor compiles ONE
    eval program at batch=N and keeps that shape for the whole run (XLA
    retraces on any new batch shape). A stream that ends mid-run re-serves
    its last frame (marked stale) instead of shrinking the batch.
  - ``open_fn`` injection decouples ingestion from cv2.VideoCapture so the
    loader is testable with synthetic cameras (tests/test_loaders.py) and
    usable with any capture-like object.
"""
from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Union

import numpy as np

from ..utils import LOGGER

__all__ = ["LoadStreams"]


def _default_open(src: str):
    import cv2

    return cv2.VideoCapture(int(src) if str(src).isdigit() else src)


class LoadStreams:
    """Read N video streams concurrently; iterate batches of latest frames.

    Args:
        sources: list of stream specs (RTSP/HTTP URLs, webcam indices as
            str/int, or video file paths), a single spec, or the path of a
            ``*.streams`` text file with one spec per line (reference
            loaders.py:46).
        vid_stride: keep every vid_stride-th frame of each stream.
        buffer: True = FIFO every kept frame (bounded at 30 per stream,
            matching the reference); False = keep only the newest frame
            (live-camera semantics — stale frames are dropped).
        open_fn: ``spec -> capture`` where capture has ``isOpened()``,
            ``grab()``, ``retrieve()``, ``read()`` and ``release()``
            (cv2.VideoCapture API). Defaults to cv2.
        poll_s: reader-thread sleep when a buffer is full / source idle.

    Iteration yields ``(paths, frames)``: N stream ids and N BGR frames
    (freshest per stream). StopIteration once EVERY stream has ended and
    all buffered frames are consumed.
    """

    MAX_BUFFER = 30  # frames per stream when buffer=True (reference :78)

    def __init__(
        self,
        sources: Union[str, Path, Sequence],
        vid_stride: int = 1,
        buffer: bool = False,
        open_fn: Optional[Callable] = None,
        poll_s: float = 0.002,
    ):
        if isinstance(sources, (str, Path)) and str(sources).endswith(".streams"):
            sources = [
                s.strip() for s in Path(sources).read_text().splitlines() if s.strip()
            ]
        elif isinstance(sources, (str, Path, int)):
            sources = [sources]
        self.sources = [str(s) for s in sources]
        n = len(self.sources)
        if n == 0:
            raise ValueError("LoadStreams needs at least one source")
        self.vid_stride = max(1, int(vid_stride))
        self.buffer = buffer
        self.poll_s = poll_s
        self._open = open_fn or _default_open
        self.running = True
        self._locks = [threading.Lock() for _ in range(n)]
        self._bufs: List[List[np.ndarray]] = [[] for _ in range(n)]
        self._last: List[Optional[np.ndarray]] = [None] * n
        self._alive = [True] * n
        self.frames_read = [0] * n
        self.frames_dropped = [0] * n

        self._caps = []
        self._threads = []
        for i, s in enumerate(self.sources):
            cap = self._open(s)
            if cap is None or not cap.isOpened():
                self.close()
                raise ConnectionError(f"cannot open stream {i}: {s}")
            ok, frame = cap.read()
            if not ok or frame is None:
                self.close()
                raise ConnectionError(f"stream {i} opened but yields no frames: {s}")
            self._bufs[i].append(frame)
            self._last[i] = frame
            self.frames_read[i] = 1
            self._caps.append(cap)
        for i, cap in enumerate(self._caps):
            t = threading.Thread(
                target=self._reader, args=(i, cap), daemon=True,
                name=f"stream-{i}",
            )
            self._threads.append(t)
            t.start()
        LOGGER.info(f"LoadStreams: {n} stream(s) up, vid_stride={self.vid_stride}")

    # ------------------------------------------------------------------ I/O
    def _reader(self, i: int, cap):
        """Daemon: grab every frame, retrieve every vid_stride-th
        (reference loaders.py:68 update())."""
        n = 0
        try:
            while self.running and cap.isOpened():
                if self.buffer and len(self._bufs[i]) >= self.MAX_BUFFER:
                    time.sleep(self.poll_s)  # backpressure: consumer behind
                    continue
                n += 1
                if not cap.grab():
                    break
                if n % self.vid_stride:
                    continue
                ok, frame = cap.retrieve()
                if not ok or frame is None:
                    break
                with self._locks[i]:
                    if self.buffer:
                        self._bufs[i].append(frame)
                    else:
                        if self._bufs[i]:
                            self.frames_dropped[i] += 1
                        self._bufs[i] = [frame]
                    self._last[i] = frame
                    self.frames_read[i] += 1
        finally:
            self._alive[i] = False
            try:
                cap.release()
            except Exception:
                pass

    def _pending(self, i: int) -> bool:
        return bool(self._bufs[i]) or self._alive[i]

    def __iter__(self):
        return self

    def __next__(self):
        if not self.running:
            raise StopIteration
        # drained: every stream dead with empty buffer
        if not any(self._pending(i) for i in range(len(self.sources))):
            raise StopIteration
        frames, paths = [], []
        for i, s in enumerate(self.sources):
            # wait for a fresh frame while the stream lives
            while self._alive[i] and not self._bufs[i]:
                time.sleep(self.poll_s)
            with self._locks[i]:
                if self._bufs[i]:
                    frame = self._bufs[i].pop(0)
                else:
                    # ended stream: re-serve the last frame so the batch
                    # shape (and the compiled program) never changes
                    frame = self._last[i]
            frames.append(frame)
            paths.append(f"{s}#frame{self.frames_read[i] - len(self._bufs[i]) - 1}")
        return paths, frames

    def __len__(self):
        return len(self.sources)

    def close(self):
        self.running = False
        for t in getattr(self, "_threads", []):
            t.join(timeout=2.0)
        for cap in getattr(self, "_caps", []):
            try:
                cap.release()
            except Exception:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
