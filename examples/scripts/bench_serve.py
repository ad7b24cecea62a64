"""Serving-engine load bench: closed-loop clients vs the dynamic batcher.

Usage: python examples/scripts/bench_serve.py [model_yaml] [imgsz] [seconds]
Env:   SERVE_MAX_BATCH (default 64), SERVE_DELAY_MS (default 5)

For each client-concurrency level, C threads run closed-loop (submit one
image, wait for the Results, repeat) for N seconds against one
InferenceServer. Reports throughput, request-latency percentiles and mean
device-batch fill — the thing to watch is throughput climbing with C as the
coalescing window fills bigger buckets, at bounded p99.

Writes runs/serve_bench.json. No reference counterpart (the reference has
no serving component); the comparison axis is bench.py's in-graph pipeline
ceiling — serving overhead = 1 - (serve img/s / bench img/s at the same
batch).
"""
import json
import os
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
# JAX_PLATFORMS is honored by the package __init__ (mirrored into
# jax.config, since site hooks can pre-import jax and void the env var)

from yolo_contour_regression_tpu.engine.model import YOLO
from yolo_contour_regression_tpu.serve import InferenceServer


def closed_loop(srv, image, stop_evt, counter):
    while not stop_evt.is_set():
        srv.submit(image).result(timeout=600.0)
        counter.append(time.perf_counter())


def main():
    model_yaml = sys.argv[1] if len(sys.argv) > 1 else "yolov8n-seg.yaml"
    imgsz = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    max_batch = int(os.environ.get("SERVE_MAX_BATCH", "64"))
    delay_ms = float(os.environ.get("SERVE_DELAY_MS", "5"))

    m = YOLO(model_yaml)
    m._ensure_variables(imgsz)
    m.fuse()
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (imgsz, imgsz, 3), dtype=np.uint8)

    # one server for every phase: the per-bucket compiles happen once
    srv = InferenceServer(
        m, imgsz=imgsz, max_batch=max_batch, max_delay_ms=delay_ms,
    ).start()
    srv.warmup()

    rows = []
    for conc in (1, 8, 32, 128):
        srv.reset_stats()
        stop_evt = threading.Event()
        counter: list = []
        threads = [
            threading.Thread(target=closed_loop, args=(srv, image, stop_evt, counter))
            for _ in range(conc)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(seconds)
        stop_evt.set()
        for t in threads:
            t.join()
        elapsed = time.perf_counter() - t0
        s = srv.stats()
        row = {
            "model": model_yaml, "imgsz": imgsz, "concurrency": conc,
            "max_batch": max_batch, "max_delay_ms": delay_ms,
            "throughput_rps": round(len(counter) / elapsed, 1),
            "mean_batch": s.get("mean_batch"),
            "latency_ms_p50": s.get("latency_ms_p50"),
            "latency_ms_p99": s.get("latency_ms_p99"),
        }
        rows.append(row)
        print(json.dumps(row))

    # open-loop saturation: a feeder keeps `depth` requests outstanding
    # without waiting for results — measures the pipeline's steady-state
    # capacity (preprocess+upload of batch N+1 overlaps execute+readback of
    # batch N), which closed-loop lockstep structurally understates
    for depth in (64, 256):
        srv.reset_stats()
        stop_evt = threading.Event()
        counter: list = []
        sem = threading.Semaphore(depth)

        def feeder():
            # keep only OUTSTANDING futures (done-callback discards): at
            # saturation rps a grow-only list would hoard every Results
            # object produced during the phase
            pending = set()
            lock = threading.Lock()

            def done(f):
                sem.release()
                counter.append(time.perf_counter())
                with lock:
                    pending.discard(f)

            while not stop_evt.is_set():
                sem.acquire()
                fut = srv.submit(image)
                with lock:
                    pending.add(fut)
                fut.add_done_callback(done)
            with lock:
                tail = list(pending)
            for f in tail:
                try:
                    f.result(timeout=600)
                except Exception:
                    pass

        th = threading.Thread(target=feeder)
        t0 = time.perf_counter()
        th.start()
        time.sleep(seconds)
        stop_evt.set()
        th.join()
        elapsed = time.perf_counter() - t0
        s = srv.stats()
        row = {
            "model": model_yaml, "imgsz": imgsz, "mode": "open_loop",
            "outstanding": depth, "max_batch": max_batch,
            "max_delay_ms": delay_ms,
            "throughput_rps": round(len(counter) / elapsed, 1),
            "mean_batch": s.get("mean_batch"),
            "latency_ms_p50": s.get("latency_ms_p50"),
            "latency_ms_p99": s.get("latency_ms_p99"),
        }
        rows.append(row)
        print(json.dumps(row))
    srv.close()

    out = Path("runs/serve_bench.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rows, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
