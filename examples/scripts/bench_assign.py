"""Breakdown bench for the polar train step's seg-specific cost.

train_bench.json shows seg/detect = 2.37x at 48 real instances (target <= 2x,
fork claim 1-2x). This isolates where the extra milliseconds go at the bench
shapes (B=16, 640px, A=8400, N=48 -> balanced cand K=48):

  1. gt-ray Pallas kernel alone        (ops/pallas_polar.gt_rays_rows_fast)
  2. full polar assigner               (utils/tal.polar_task_aligned_assign)
  3. segmentation_loss fwd+grad on FAKE feats (no model) vs detection_loss
     fwd+grad on fake feats — the pure loss-side delta

Timing: in-graph fori_loop with carried data dependency (same as bench.py).
Writes runs/assign_bench.json. Run SOLO on the TPU.
"""
import json
import math
import sys
import time
from functools import partial
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import numpy as np


def timed_loop(fn, n_long=10, n_short=2, reps=3):
    """fn(n) must run the op n times in-graph and return a scalar."""
    float(fn(n_short))
    float(fn(n_long))

    def t(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(n_long) - t(n_short)) / (n_long - n_short)


def main(B=16, imgsz=640, N=48, nc=10):
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from yolo_contour_regression_tpu.ops import polar as polar_ops
    from yolo_contour_regression_tpu.ops.pallas_polar import gt_rays_rows_fast
    from yolo_contour_regression_tpu.utils.tal import (
        polar_task_aligned_assign, resolve_cand,
    )
    from yolo_contour_regression_tpu.utils.loss import (
        detection_loss, segmentation_loss,
    )

    A = sum((imgsz // s) ** 2 for s in (8, 16, 32))
    K = resolve_cand(128, A, n_pad=N, balance=True)
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    contour01 = np.stack([0.5 + 0.2 * np.cos(t), 0.5 + 0.2 * np.sin(t)], -1)

    # --- 1. kernel alone -----------------------------------------------------
    R = B * N
    contours = jnp.asarray(
        np.tile(contour01[None] * imgsz, (R, 1, 1)), jnp.float32)
    centers = jnp.asarray(rng.uniform(0.3, 0.7, (R, K, 2)) * imgsz, jnp.float32)
    valid = jnp.ones((R, K), bool)

    @partial(jax.jit, static_argnames=("n",))
    def loop_kernel(c, n):
        def body(i, acc):
            out = gt_rays_rows_fast(contours, centers + acc * 1e-12, valid)
            return acc + out[0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, n, body, c)

    ms_kernel = timed_loop(lambda n: loop_kernel(jnp.zeros(()), n)) * 1e3

    # --- 2. assigner total ---------------------------------------------------
    feat_hw = [(imgsz // s, imgsz // s) for s in (8, 16, 32)]
    anc, stride_t = polar_ops.make_anchors(feat_hw, (8, 16, 32), dtype=jnp.float32)
    pd_scores = jnp.asarray(rng.uniform(0, 1, (B, A, nc)), jnp.float32)
    pd_rays = jnp.asarray(rng.uniform(1, 50, (B, A, 36)), jnp.float32)
    gt_labels = jnp.ones((B, N), jnp.int32)
    gt_boxes = jnp.tile(jnp.asarray([0.1, 0.1, 0.9, 0.9]) * imgsz, (B, N, 1))
    gt_contours = jnp.asarray(
        np.tile(contour01[None, None] * imgsz, (B, N, 1, 1)), jnp.float32)
    mask_gt = jnp.ones((B, N), bool)

    @partial(jax.jit, static_argnames=("n",))
    def loop_assign(c, n):
        def body(i, acc):
            r = polar_task_aligned_assign(
                pd_scores, pd_rays + acc * 1e-12, anc * stride_t, gt_labels,
                gt_boxes, gt_contours, mask_gt, cand=K)
            return acc + r.fg_mask.sum().astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, n, body, c)

    ms_assign = timed_loop(lambda n: loop_assign(jnp.zeros(()), n)) * 1e3

    # --- 3. loss fwd+grad on fake feats -------------------------------------
    HYP = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5, cand_balance=True)
    feats_seg = [jnp.asarray(rng.normal(0, 1, (B, h, w, 36 + nc)), jnp.float32)
                 for h, w in feat_hw]
    feats_det = [jnp.asarray(rng.normal(0, 1, (B, h, w, 64 + nc)), jnp.float32)
                 for h, w in feat_hw]
    batch = {
        "cls": jnp.ones((B, N), jnp.int32),
        "bboxes": jnp.tile(jnp.asarray([0.5, 0.5, 0.8, 0.8]), (B, N, 1)),
        "mask_gt": jnp.ones((B, N), bool),
        "segments": jnp.asarray(np.tile(contour01[None, None], (B, N, 1, 1)),
                                jnp.float32),
    }

    def make_loss_loop(feats, loss_fn):
        g = jax.grad(lambda fs, key: loss_fn(
            [f + key * 1e-12 for f in fs], batch, (8, 16, 32), nc, HYP).total)

        @partial(jax.jit, static_argnames=("n",))
        def loop(c, n):
            def body(i, acc):
                gr = g(feats, acc)
                return acc + gr[0].sum() * 1e-20
            return jax.lax.fori_loop(0, n, body, c)

        return lambda n: loop(jnp.zeros(()), n)

    ms_seg_loss = timed_loop(make_loss_loop(feats_seg, segmentation_loss)) * 1e3
    ms_det_loss = timed_loop(make_loss_loop(feats_det, detection_loss)) * 1e3

    rec = {
        "B": B, "imgsz": imgsz, "N": N, "K": K, "A": A,
        "ms_gt_ray_kernel": round(ms_kernel, 2),
        "ms_polar_assign_total": round(ms_assign, 2),
        "ms_seg_loss_fwdgrad": round(ms_seg_loss, 2),
        "ms_det_loss_fwdgrad": round(ms_det_loss, 2),
        "ms_assign_minus_kernel": round(ms_assign - ms_kernel, 2),
        "ms_seg_minus_det_loss": round(ms_seg_loss - ms_det_loss, 2),
        "note": "fake-feats loss isolates seg-specific cost from the conv model",
    }
    out = ROOT / "runs" / "assign_bench.json"
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))


if __name__ == "__main__":
    main(N=int(sys.argv[1]) if len(sys.argv) > 1 else 48)
