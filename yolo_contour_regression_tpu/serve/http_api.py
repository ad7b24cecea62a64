"""Stdlib HTTP frontend for ``InferenceServer`` (no web-framework deps).

Endpoints:

- ``POST /predict`` — body = encoded image bytes (jpeg/png/...); response =
  ``{"results": <Results.tojson()>, "speed_ms": ...}``.
- ``GET /stats``   — serving metrics (``ServerStats.snapshot`` + queue depth).
- ``GET /healthz`` — 200 once the dispatcher thread is alive.

Many request threads can post concurrently (ThreadingHTTPServer); they all
funnel into the server's single dispatcher thread, which is exactly the
dynamic-batching pattern the engine is built for — HTTP concurrency becomes
device batch fill.

The reference has no serving component (deploy story = export + BYO
server); this module is a beyond-reference addition.
"""
from __future__ import annotations

import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..utils import LOGGER
from .server import InferenceServer


def make_handler(server: InferenceServer):
    import cv2

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route access logs through LOGGER
            LOGGER.debug("serve.http: " + fmt % args)

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                alive = server._thread is not None and server._thread.is_alive()
                self._reply(200 if alive else 503, {"ok": alive})
            elif self.path == "/stats":
                self._reply(200, server.stats())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            n = int(self.headers.get("Content-Length", 0))
            if n <= 0:
                self._reply(400, {"error": "empty body (expected image bytes)"})
                return
            raw = self.rfile.read(n)
            img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                self._reply(400, {"error": "could not decode image"})
                return
            t0 = time.perf_counter()
            try:
                res = server.submit(img).result(timeout=60.0)
            except Exception as e:
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._reply(200, {
                "results": json.loads(res.tojson()),
                "speed_ms": round((time.perf_counter() - t0) * 1e3, 2),
            })

    return Handler


def serve_http(
    weights,
    host: str = "127.0.0.1",
    port: int = 8570,
    imgsz: int = 640,
    max_batch: int = 32,
    max_delay_ms: float = 5.0,
    warmup_buckets: Optional[list] = None,
    **server_kwargs,
) -> ThreadingHTTPServer:
    """Start an InferenceServer + HTTP frontend; returns the httpd (caller
    runs ``httpd.serve_forever()``; ``httpd.engine`` is the InferenceServer).

    ``warmup_buckets``: None (default) pre-traces EVERY bucket before
    traffic — the documented serving contract; pass an explicit subset to
    warm fewer, or ``()`` to skip warmup entirely (tests/dev)."""
    engine = InferenceServer(
        weights, imgsz=imgsz, max_batch=max_batch,
        max_delay_ms=max_delay_ms, **server_kwargs,
    )
    # bind the port FIRST: an EADDRINUSE must fail fast, not after minutes
    # of per-bucket XLA compiles (and must not leak a running dispatcher)
    httpd = ThreadingHTTPServer((host, port), make_handler(engine))
    try:
        engine.start()
        if warmup_buckets is None:
            engine.warmup()
        elif warmup_buckets:
            engine.warmup(warmup_buckets)
    except BaseException:
        httpd.server_close()
        engine.close(drain=False)
        raise
    httpd.engine = engine
    LOGGER.info(f"serve.http: listening on http://{host}:{port} (POST /predict)")
    return httpd
