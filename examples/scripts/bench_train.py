"""Training-step benchmark: polar-seg vs detect fused train step at 640px.

The fork's README claims polar-seg training costs 1-2x detect training
(reference /root/reference README, 缺点 1). This records the measured ratio
for the TPU rebuild at the typical instance bucket (8 objects/img — see
data/augment.py:collate bucketing) and at the 48-slot worst case.
Writes runs/train_bench.json.

Timing: in-graph fori_loop with a carried data dependency (same methodology
as bench.py — block_until_ready cannot be trusted on tunneled-TPU hosts).
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


def measure(task: str, nmax: int, imgsz: int = 640, B: int = 16,
            n_real: int = None, crowded: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.loss import detection_loss, segmentation_loss

    HYP = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    yaml_name = "yolov8-seg.yaml" if task == "segment" else "yolov8.yaml"
    m = build_model(
        str(ROOT / "yolo_contour_regression_tpu/cfg/models" / yaml_name),
        nc=10, dtype=jnp.bfloat16,
    )
    v = m.init(imgsz=imgsz)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, imgsz, imgsz, 3)).astype(np.float32))
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    contour = np.stack([0.5 + 0.2 * np.cos(t), 0.5 + 0.2 * np.sin(t)], -1)
    n_real = nmax if n_real is None else n_real
    mask = np.zeros((B, nmax), bool)
    mask[:, :n_real] = True
    if crowded:
        # realistic crowded geometry: n scattered SMALL objects (a COCO-style
        # crowd). Each GT's in-box anchor count is small, so the assigner's
        # in-box-first candidate ranking leaves mostly-invalid K-rows and the
        # v3 kernel's block skip engages — unlike the adversarial default
        # below, where every GT spans the whole image.
        side = int(math.ceil(math.sqrt(nmax)))
        cxs = (np.arange(nmax) % side + 0.5) / side
        cys = (np.arange(nmax) // side + 0.5) / side
        wh = 0.8 / side
        boxes = np.stack([cxs, cys, np.full(nmax, wh), np.full(nmax, wh)], -1)
        bboxes = jnp.asarray(np.tile(boxes[None], (B, 1, 1)), jnp.float32)
        segs = np.stack(
            [np.stack([cxs[n] + (wh / 2) * np.cos(t), cys[n] + (wh / 2) * np.sin(t)], -1)
             for n in range(nmax)]
        )
        segments = jnp.asarray(np.tile(segs[None], (B, 1, 1, 1)), jnp.float32)
    else:
        bboxes = jnp.tile(jnp.asarray([0.5, 0.5, 0.4, 0.4]), (B, nmax, 1))
        segments = jnp.tile(jnp.asarray(contour, jnp.float32), (B, nmax, 1, 1))
    batch = {
        "cls": jnp.ones((B, nmax), jnp.int32),
        "bboxes": bboxes,
        "mask_gt": jnp.asarray(mask),
    }
    if task == "segment":
        batch["segments"] = segments

    def loss_fn(p, key):
        feats, _ = m.raw_forward({**v, "params": p}, img + key * 1e-12, train=True)
        if task == "segment":
            # production default: cand_per_gt=128 with the work-balanced
            # crowded-bucket budget (utils/tal.py resolve_cand)
            return segmentation_loss(feats, batch, m.strides, m.nc, HYP, cand=128).total
        return detection_loss(feats, batch, m.strides, m.nc, HYP).total

    g = jax.jit(jax.grad(loss_fn))

    @partial(jax.jit, static_argnames=("n",))
    def loop(p, n):
        def body(i, acc):
            gr = g(p, acc)
            return acc + jax.tree_util.tree_leaves(gr)[0].astype(jnp.float32).sum() * 1e-20

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(v["params"], 2))
    float(loop(v["params"], 10))

    def timed(n):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(v["params"], n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per = (timed(10) - timed(2)) / 8
    return {"task": task, "nmax": nmax, "n_real": n_real,
            "ms_per_step": round(per * 1e3, 1),
            "imgs_per_sec": round(B / per, 0), "batch": B, "imgsz": imgsz}


def main():
    rows = [
        measure("detect", 8),
        measure("segment", 8),
        measure("segment", 48),              # adversarial: 48 image-filling GTs
        measure("segment", 48, n_real=8),    # padded bucket: kernel block-skip
        measure("detect", 48),               # matched denominator for the 48 rows
        measure("detect", 48, crowded=True),
        measure("segment", 48, crowded=True),  # realistic crowd: 48 small GTs
    ]
    rows[2]["label"] = "adversarial48"
    rows[5]["label"] = rows[6]["label"] = "crowded48"
    det = rows[0]["ms_per_step"]
    rec = {
        "rows": rows,
        "seg_over_detect_typical": round(rows[1]["ms_per_step"] / det, 2),
        # worst case, like-for-like: both tasks fed the SAME 48-GT batch
        "seg_over_detect_worst48": round(
            rows[2]["ms_per_step"] / rows[4]["ms_per_step"], 2),
        "seg_over_detect_pad48": round(rows[3]["ms_per_step"] / det, 2),
        # the realistic crowded case (48 small scattered objects)
        "seg_over_detect_crowded48": round(
            rows[6]["ms_per_step"] / rows[5]["ms_per_step"], 2),
        "note": "fused fwd+assign+loss+grad step; fork claim: seg trains at "
                "1-2x detect. adversarial48 = every GT spans the whole image "
                "(all K candidates in-box for all 48 GTs - a geometry real "
                "data cannot produce); crowded48 = COCO-style crowd",
    }
    out = ROOT / "runs" / "train_bench.json"
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
