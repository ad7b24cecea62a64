"""Headline benchmark: yolov8n-seg (polar) end-to-end pipeline throughput.

Measures images/sec/chip at 640px for the full inference pipeline —
normalize (pre) + backbone/PAN/head + in-graph polar decode + on-device NMS —
on the default JAX device (one TPU chip under the driver).

Timing methodology: on this image the TPU is reached through a tunnel where
``block_until_ready`` does not actually synchronize (measured 27x physical
peak with it) and a host readback costs ~30ms RTT. So the pipeline is
iterated IN-GRAPH with a lax.fori_loop whose carry creates a true data
dependency between iterations, and per-iteration time is the difference
between a long and a short loop (RTT and dispatch cancel out).

Batch strategy: throughput rises with batch (measured on one v5e:
16->3082, 32->3650, 64->5119, 128->7310, 256->6720 img/s), but large jit
graphs have occasionally stalled the remote-compile tunnel, so main() tries
batches 128/64/32 in TIMEOUT-GUARDED SUBPROCESSES and falls back to the
always-reliable batch 16 in-process. Set BENCH_BATCH to pin a batch and
skip the ladder.

Baseline anchor (BASELINE.md): the reference's A100-TensorRT yolov8n-seg
pipeline is ~826 img/s. North star: >= 2x that per chip.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_IMGS_PER_SEC = 826.0  # A100 TensorRT yolov8n-seg (README.md:140,148)
PEAK_BF16_FLOPS = 197e12  # TPU v5e peak bf16 (public spec)
PEAK_INT8_OPS = 394e12  # TPU v5e peak int8 (2x bf16) — MFU denominator for BENCH_INT8


def measure(batch: int) -> dict:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.ops.nms import non_max_suppression

    imgsz = 640
    dtype = jnp.bfloat16

    # BENCH_MODEL picks the scale (yolov8n-seg default; s/m for the
    # reference README.md:140-144 ladder — runs/bench_scales.json)
    model_name = os.environ.get("BENCH_MODEL", "yolov8n-seg")
    model = build_model(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"yolo_contour_regression_tpu/cfg/models/{model_name}.yaml",
        ),
        nc=10,
        dtype=dtype,
    )
    variables = model.init(imgsz=imgsz)
    # deploy benchmark: structural reparameterization (RepConv/Conv2/BN fold),
    # matching the deploy-optimized TensorRT baseline
    from yolo_contour_regression_tpu.nn.fuse import fuse_variables

    variables, model = fuse_variables(model, variables)
    # BENCH_FOLD_PRE=1: fold the /255 normalize into the stem conv (exact —
    # conv is linear in an input scale) so the pipeline feeds the raw-cast
    # uint8 image and skips the standalone normalize pass over HBM
    fold_pre = bool(os.environ.get("BENCH_FOLD_PRE"))
    if fold_pre:
        from yolo_contour_regression_tpu.nn.fuse import fold_input_scale

        variables = fold_input_scale(variables)
    if os.environ.get("BENCH_INT8"):
        # opt-in native w8a8 path (nn/quant.py): int8 convs on the MXU.
        # Random-image calibration is fine for throughput (scales only
        # affect accuracy); measured ~lossless on the floor ckpt
        # (tests/test_quant.py)
        from yolo_contour_regression_tpu.nn.quant import quantize_variables

        # folded stems expect raw 0..255 inputs — calibrate in that range
        calib = np.random.default_rng(1).uniform(
            0, 255.0 if fold_pre else 1.0, (2, imgsz, imgsz, 3)
        )
        selective = os.environ["BENCH_INT8"].lower() in ("auto", "selective")
        variables, model = quantize_variables(
            model, variables, [calib.astype(np.float32)], selective=selective
        )
        model_name += "-int8auto" if selective else "-int8"

    # pipeline variants, newest first (BENCH_PIPE = topk|parts|full|lazy):
    #   topk: filter-before-decode — candidates selected on raw class logits,
    #     boxes/extras decoded for the pre_nms winners only; no full-anchor
    #     boxes/extras tensors at all (head.decode_polar_topk). Equivalence
    #     pinned by test_nms.py::test_topk_path_matches_parts_pipeline.
    #   parts: predict_parts -> non_max_suppression_parts ->
    #     finalize survivors. No (B, C, A) layout round-trip, no full-tensor
    #     f32 cast, no 108-column contour materialization — equivalence
    #     pinned by test_nms.py::test_parts_path_matches_reference_layout.
    #   full: the reference-layout path ((B, 4+nc+108, A) + transpose + f32
    #     cast), kept measurable as the export-contract baseline.
    #   lazy: the r3 lazy-decode variant (same layout, 38-col extras).
    pipe = os.environ.get("BENCH_PIPE", "parts")
    if os.environ.get("BENCH_LAZY"):  # back-compat alias
        pipe = "lazy"

    def one_iter(variables, raw_u8, acc):
        from yolo_contour_regression_tpu.nn.modules.head import (
            finalize_polar_extras,
        )
        from yolo_contour_regression_tpu.ops.nms import non_max_suppression_parts

        x = raw_u8.astype(dtype) + (acc * 1e-12).astype(dtype)
        if not fold_pre:
            x = x / 255.0
        # pre_nms=300 == max_det: the smallest candidate pre-select that
        # keeps full output capacity. mAP-neutral even at val conf=0.001 on
        # the trained floor model (runs/floor/floor.json pre_nms_delta:
        # 512==1024==4096, and measured identical down to 128); the (k,k)
        # suppression matrix shrink is worth ~5% pipeline throughput vs 512
        kw = dict(conf_thres=0.25, iou_thres=0.7, pre_nms=300, max_det=300)
        if pipe == "topk":
            from yolo_contour_regression_tpu.ops.nms import (
                non_max_suppression_selected,
            )

            boxes, scores, classes, extras = model.predict_topk(
                variables, x, k=kw["pre_nms"], conf_thres=kw["conf_thres"]
            )
            out = non_max_suppression_selected(
                boxes, scores, classes, extras,
                conf_thres=kw["conf_thres"], iou_thres=kw["iou_thres"],
                max_det=kw["max_det"],
            )
            ex = finalize_polar_extras(out["extras"])
            return out["scores"].sum() + ex.sum() * 1e-12
        if pipe == "parts":
            boxes, logits, extras = model.predict_parts(variables, x, sigmoid=False)
            out = non_max_suppression_parts(
                boxes, logits, extras, scores_are_logits=True, **kw
            )
            ex = finalize_polar_extras(out["extras"])
            return out["scores"].sum() + ex.sum() * 1e-12
        pred = (model.predict_lazy if pipe == "lazy" else model.predict)(variables, x)
        out = non_max_suppression(pred.astype(jnp.float32), nc=model.nc, **kw)
        if pipe == "full":
            # carry the gathered contour extras too, else XLA dead-code
            # eliminates the entire polar decode from the timed graph
            return out["scores"].sum() + out["extras"].sum() * 1e-12
        ex = finalize_polar_extras(out["extras"])
        # fold the finalized contours into the carried scalar so the
        # post-NMS decode stays live in the timed graph
        return out["scores"].sum() + ex.sum() * 1e-12

    @partial(jax.jit, static_argnames=("n",))
    def pipeline_loop(variables, raw_u8, n):
        def body(i, acc):
            # acc feeds back into the input: a real data dependency, so the
            # n iterations cannot overlap or be elided
            return one_iter(variables, raw_u8, acc)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))

    n_short = int(os.environ.get("BENCH_NSHORT", "4"))
    n_long = int(os.environ.get("BENCH_NLONG", "36"))

    def timed(n):
        float(pipeline_loop(variables, raw, n))  # warmup/compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(pipeline_loop(variables, raw, n))  # readback = true sync
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_short = timed(n_short)
    t_long = timed(n_long)
    per_iter = (t_long - t_short) / (n_long - n_short)
    imgs_per_sec = batch / per_iter

    # MFU from XLA's optimized-HLO flop count of one pipeline iteration
    mfu = flops_per_img = None
    try:
        lowered = jax.jit(one_iter).lower(
            variables, raw, jnp.zeros((), jnp.float32)
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            flops_per_img = flops / batch
            peak = PEAK_INT8_OPS if os.environ.get("BENCH_INT8") else PEAK_BF16_FLOPS
            mfu = imgs_per_sec * flops_per_img / peak
    except Exception:
        pass

    out = {
        "metric": f"{model_name}_e2e_throughput_640px",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
        "batch": batch,
    }
    if mfu is not None:
        out["flops_per_img"] = round(flops_per_img / 1e9, 2)  # GFLOPs
        out["mfu"] = round(mfu, 4)
    return out


def probe():
    """Tiny jit on the default device; proves the backend is alive.

    Runs in a timeout-guarded subprocess because on this image a half-dead
    tunnel makes backend init HANG (not error) inside make_c_api_client —
    only an external kill gets control back.
    """
    import faulthandler

    faulthandler.dump_traceback_later(55, exit=True)  # belt under the 60s kill
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.bfloat16)
    float((x @ x).sum())
    print("PROBE_OK", jax.devices()[0].platform)


def _fail(reason):
    name = os.environ.get("BENCH_MODEL", "yolov8n-seg")
    if os.environ.get("BENCH_INT8"):
        name += "-int8"
    print(json.dumps({
        "metric": f"{name}_e2e_throughput_640px",
        "value": 0,
        "unit": "imgs/sec/chip",
        "vs_baseline": 0,
        "error": reason,
    }))


def main():
    pinned = os.environ.get("BENCH_BATCH")
    if pinned:
        print(json.dumps(measure(int(pinned))))
        return

    # TOTAL wall time is bounded under the driver's budget (VERDICT r3 #1):
    # 60s probe + 480s best-batch attempt + 180s fallback = 12 min worst case.
    # Round 3's 4x full-budget ladder (45 min worst case) outlived the driver
    # and produced rc=124 with no output at all.
    here = os.path.abspath(__file__)

    def run_sub(args, env, budget):
        try:
            r = subprocess.run(
                [sys.executable, here, *args],
                env=env, capture_output=True, text=True, timeout=budget,
            )
            return r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        except subprocess.TimeoutExpired:
            return ""

    # 1) backend probe: tiny jit, hard 60s kill. A dead/half-dead tunnel
    #    fails here and the honest-failure JSON prints within one minute.
    if "PROBE_OK" not in run_sub(["--probe"], dict(os.environ), 60):
        _fail("backend probe failed within 60s (tunnel down?)")
        return

    # 2) at most two timed attempts: the headline batch, then the small
    #    always-reliable fallback. Each in its own subprocess so a
    #    remote-compile stall can't exceed its budget.
    for batch, budget in ((int(os.environ.get("BENCH_BATCH_MAIN", "128")), 480),
                          (16, 180)):
        line = run_sub([], dict(os.environ, BENCH_BATCH=str(batch)), budget)
        try:
            rec = json.loads(line)
            if rec.get("value", 0) > 0:
                print(json.dumps(rec))
                return
        except (json.JSONDecodeError, ValueError):
            pass
    _fail("probe ok but timed attempts failed within budget")


if __name__ == "__main__":
    if "--probe" in sys.argv:
        probe()
    else:
        main()
