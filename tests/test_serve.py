"""Serving subsystem (serve/): dynamic batching, bucket padding, HTTP API.

The reference has no serving component (its predictor streams batch-1,
reference ultralytics/engine/predictor.py:240-300) — these tests pin the
beyond-reference contract: batched serving returns byte-identical results
to the direct predictor path, coalesces concurrent requests into shared
device batches, and pads to static shape buckets without contaminating
real rows.
"""
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from yolo_contour_regression_tpu.engine.model import YOLO
from yolo_contour_regression_tpu.serve import InferenceServer

IMGSZ = 64


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (72, 96, 3), dtype=np.uint8) for _ in range(n)]


@pytest.fixture(scope="module")
def seg_handle():
    m = YOLO("yolov8n-seg.yaml")
    m._ensure_variables(IMGSZ)
    m.fuse()
    return m


def test_serve_matches_direct_predict(seg_handle):
    """Server results (batched, padded to bucket 4) == direct batch-1
    predictor results on the same fused weights."""
    imgs = _images(3, seed=1)
    with InferenceServer(
        seg_handle, imgsz=IMGSZ, max_batch=4, max_delay_ms=100.0, conf=0.001
    ) as srv:
        got = srv.infer(imgs, timeout=300.0)

    from yolo_contour_regression_tpu.engine.model import TASK_MAP

    predictor = TASK_MAP["segment"]["predictor"]()
    predictor.args.conf = 0.001
    predictor.args.imgsz = IMGSZ
    want = predictor(seg_handle.model, seg_handle.variables, imgs)

    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        assert len(g) == len(w)
        if g.boxes is not None and len(g):
            np.testing.assert_allclose(g.boxes.data, w.boxes.data, rtol=1e-4, atol=1e-4)


def test_serve_coalesces_and_pads(seg_handle):
    """Concurrent submits land in shared batches (batches < requests) and
    non-power-of-two fills are padded to the next bucket."""
    srv = InferenceServer(
        seg_handle, imgsz=IMGSZ, max_batch=8, max_delay_ms=500.0, conf=0.25,
        buckets=[8],  # single bucket: ANY batch < 8 must be padded
    ).start()
    try:
        srv.warmup([8])  # compile before timing-sensitive coalescing
        imgs = _images(6, seed=2)
        futs = []
        threads = [
            threading.Thread(target=lambda im=im: futs.append(srv.submit(im)))
            for im in imgs
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for f in list(futs):
            f.result(timeout=300.0)
        s = srv.stats()
        assert s["requests"] == 6
        assert s["batches"] < 6, f"no coalescing happened: {s}"
        assert max(int(k) for k in s["batch_hist"]) > 1
        # the only bucket is 8, so every formed batch of n < 8 pads 8 - n
        # rows; 6 requests pad >= 2 regardless of how the window split them
        assert s["padded_rows"] >= 2
    finally:
        srv.close()


def test_serve_close_semantics(seg_handle):
    srv = InferenceServer(seg_handle, imgsz=IMGSZ, max_batch=2, max_delay_ms=1.0).start()
    fut = srv.submit(_images(1)[0])
    srv.close()  # drains: pending request completes
    assert fut.result(timeout=300.0) is not None
    with pytest.raises(RuntimeError):
        srv.submit(_images(1)[0])
    # restart after close must yield a LIVE server (fresh dispatcher), not
    # one whose dispatcher exits on a stale closing flag
    srv.start()
    assert srv.submit(_images(1)[0]).result(timeout=300.0) is not None
    srv.close()


def test_serve_classify():
    m = YOLO("yolov8-cls.yaml")
    m._ensure_variables(IMGSZ)
    with InferenceServer(m, imgsz=IMGSZ, max_batch=2, max_delay_ms=20.0) as srv:
        res = srv.infer(_images(2, seed=3), timeout=300.0)
    assert len(res) == 2
    assert res[0].probs is not None and len(np.asarray(res[0].probs.data)) == m.model.nc


def test_serve_http(seg_handle):
    import cv2

    from yolo_contour_regression_tpu.serve.http_api import serve_http

    httpd = serve_http(
        seg_handle, host="127.0.0.1", port=0, imgsz=IMGSZ,
        max_batch=2, max_delay_ms=5.0, warmup_buckets=(), conf=0.001,
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        ok, buf = cv2.imencode(".jpg", _images(1, seed=4)[0])
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.tobytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
        assert r.status == 200 if hasattr(r, "status") else True
        assert "results" in payload and "speed_ms" in payload

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True
    finally:
        httpd.shutdown()
        httpd.engine.close()


def test_yolo_serve_mode(seg_handle):
    """YOLO.serve(background=True) exposes the server over HTTP; 'serve' is a
    CLI mode (yolo segment serve model=... port=...)."""
    from yolo_contour_regression_tpu.cfg import MODES

    assert "serve" in MODES

    httpd = seg_handle.serve(
        port=0, imgsz=IMGSZ, max_batch=2, max_delay_ms=5.0,
        background=True, warmup_buckets=(), conf=0.25,
    )
    try:
        port = httpd.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True
    finally:
        httpd.shutdown()
        httpd.engine.close()


@pytest.mark.slow
def test_serve_rtdetr():
    """RT-DETR's eval returns a raw (B, nq, 4+nc) array (no NMS dict) — the
    server must route it through RTDETRPredictor.postprocess, not the
    classify probs branch."""
    from yolo_contour_regression_tpu.models.rtdetr.model import RTDETR

    m = RTDETR("rtdetr-l.yaml")
    m._ensure_variables(IMGSZ)
    with InferenceServer(m, imgsz=IMGSZ, max_batch=2, max_delay_ms=20.0, fuse=False) as srv:
        res = srv.infer(_images(2, seed=5), timeout=600.0)
    assert len(res) == 2
    assert res[0].probs is None  # boxes-task Results, not classify
    assert res[0].boxes is None or res[0].boxes.data.shape[-1] == 6


def test_serve_mesh_dp(seg_handle):
    """Data-parallel serving over an 8-device mesh: params replicated,
    batches dim-0-sharded, buckets forced to mesh-size multiples — results
    equal the single-device server on the same weights."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs[:8]), ("batch",))

    imgs = _images(3, seed=6)
    with InferenceServer(
        seg_handle, imgsz=IMGSZ, max_batch=8, max_delay_ms=100.0, conf=0.001,
        mesh=mesh,
    ) as srv:
        assert all(b % 8 == 0 for b in srv.buckets), srv.buckets
        got = srv.infer(imgs, timeout=600.0)
    # the appended capacity bucket must be mesh-rounded too (max_batch=20
    # with an 8-way mesh must NOT yield a raw 20 bucket)
    srv20 = InferenceServer(
        seg_handle, imgsz=IMGSZ, max_batch=20, buckets=[4], mesh=mesh
    )
    assert all(b % 8 == 0 for b in srv20.buckets), srv20.buckets
    with InferenceServer(
        seg_handle, imgsz=IMGSZ, max_batch=4, max_delay_ms=100.0, conf=0.001
    ) as srv1:
        want = srv1.infer(imgs, timeout=600.0)
    for g, w in zip(got, want):
        assert len(g) == len(w)
        if len(g):
            np.testing.assert_allclose(g.boxes.data, w.boxes.data, rtol=1e-4, atol=1e-4)


def test_serve_bad_request_isolated(seg_handle):
    """A malformed image fails only its own future — requests coalesced into
    the same batch still succeed."""
    srv = InferenceServer(
        seg_handle, imgsz=IMGSZ, max_batch=4, max_delay_ms=150.0, conf=0.25
    ).start()
    try:
        srv.warmup([2])
        good = _images(2, seed=7)
        bad = np.zeros((0, 0, 3), np.uint8)  # undecodable/empty image
        futs = [srv.submit(good[0]), srv.submit(bad), srv.submit(good[1])]
        assert futs[0].result(timeout=300.0) is not None
        assert futs[2].result(timeout=300.0) is not None
        with pytest.raises(Exception):
            futs[1].result(timeout=300.0)
        # a failed request must not brick the server: fresh submits succeed
        assert srv.submit(good[0]).result(timeout=300.0) is not None
        assert srv.stats()["last_error"] is None
    finally:
        srv.close()


def test_serve_int8_handle():
    """Serving a native-int8 handle: the server's fuse=True default must not
    re-fuse it (nn/fuse.py idempotence) and results must match direct
    quantized predict — the production deploy combo."""
    rng = np.random.default_rng(8)
    m = YOLO("yolov8n-seg.yaml")
    m._ensure_variables(IMGSZ)
    m.quantize([rng.uniform(0, 1, (1, IMGSZ, IMGSZ, 3)).astype(np.float32)])

    imgs = _images(2, seed=8)
    with InferenceServer(m, imgsz=IMGSZ, max_batch=2, max_delay_ms=50.0, conf=0.25) as srv:
        got = srv.infer(imgs, timeout=300.0)

    from yolo_contour_regression_tpu.engine.model import TASK_MAP

    predictor = TASK_MAP["segment"]["predictor"]()
    predictor.args.conf = 0.25
    predictor.args.imgsz = IMGSZ
    want = predictor(m.model, m.variables, imgs)
    for g, w in zip(got, want):
        assert len(g) == len(w)
        if len(g):
            np.testing.assert_allclose(g.boxes.data, w.boxes.data, rtol=1e-4, atol=1e-4)
