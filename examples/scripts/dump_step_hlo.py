"""Dump the optimized HLO of the fused train step and summarize the named
fusions the profiler flagged (runs/profile_step_detect_b16.json:
fusion.2406/2408 at ~8 ms/step each). Greps the fusion bodies for their
root ops + operand shapes so the hot op can be named without a remote HLO
dump. Usage: python examples/scripts/dump_step_hlo.py [task] [fusion ...]
"""
import math
import re
import sys
from pathlib import Path
from types import SimpleNamespace

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import numpy as np


def main(task="detect", names=("fusion.2406", "fusion.2408", "sort.11")):
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.engine.step import (
        init_train_state,
        make_multi_train_step,
    )
    from yolo_contour_regression_tpu.nn.tasks import build_model
    from yolo_contour_regression_tpu.utils.optim import build_optimizer

    B, imgsz, K, nmax, n_real = 16, 640, 8, 16, 8
    hyp = SimpleNamespace(
        lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
        warmup_epochs=0.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
        box=7.5, cls=0.5, dfl=1.5, epochs=1, optimizer="SGD", cos_lr=False,
        batch=B, nbs=B, nc=2,
    )
    yaml_name = "yolov8-seg.yaml" if task == "segment" else "yolov8.yaml"
    model = build_model(
        str(ROOT / "yolo_contour_regression_tpu/cfg/models" / yaml_name),
        nc=2, dtype=jnp.bfloat16,
    )
    variables = model.init(imgsz=imgsz)
    tx = build_optimizer(variables["params"], hyp, steps_per_epoch=K, iterations=64)
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * math.pi, 360, endpoint=False)
    segs = np.stack([0.5 + 0.1 * np.cos(t), 0.5 + 0.1 * np.sin(t)], -1)
    mask = np.zeros((K, B, nmax), bool)
    mask[..., :n_real] = True
    labels = {
        "cls": jnp.zeros((K, B, nmax), jnp.int32),
        "bboxes": jnp.asarray(np.tile(np.array([0.5, 0.5, 0.2, 0.2], np.float32),
                                      (K, B, nmax, 1))),
        "segments": jnp.asarray(np.tile(segs.astype(np.float32),
                                        (K, B, nmax, 1, 1))),
        "mask_gt": jnp.asarray(mask),
    }
    images = jnp.zeros((K, B, imgsz, imgsz, 3), jnp.float32)
    multi_fn = make_multi_train_step(model, tx, hyp, cand=128, donate=False,
                                     augment_fn=None, from_pool=False)
    state = init_train_state(variables, tx)
    compiled = jax.jit(lambda s, im, lb: multi_fn(s, im, lb)).lower(
        state, images, labels).compile()
    txt = compiled.as_text()
    out = ROOT / "runs" / f"step_hlo_{task}.txt"
    out.write_text(txt)
    print(f"HLO {len(txt)} chars -> {out}")
    for name in names:
        # fusion computation bodies are named like %fused_computation.N;
        # the instruction is %fusion.N = ... fusion(...), calls=%fused_...
        m = re.search(rf"%{re.escape(name)} = [^\n]+", txt)
        if not m:
            print(f"--- {name}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"--- {name}: {line[:300]}")
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm:
            body = re.search(
                rf"%?{re.escape(cm.group(1))} \([^)]*\) -> [^{{]+\{{(.*?)\n\}}",
                txt, re.S)
            if body:
                ops = re.findall(r"= (\S+?) ", body.group(1))
                from collections import Counter
                print("    body ops:", Counter(o.split("(")[0] for o in ops).most_common(12))
                big = re.findall(r"(f32|bf16|s32|pred)\[([\d,]+)\]", body.group(1))
                sizes = Counter()
                for dt, dims in big:
                    n = 1
                    for d in dims.split(","):
                        n *= int(d)
                    sizes[(dt, dims)] = n
                print("    biggest tensors:", [
                    (f"{dt}[{dims}]", n) for (dt, dims), n in
                    sorted(sizes.items(), key=lambda kv: -kv[1])[:6]
                ])


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "detect", tuple(a[1:]) or ("fusion.2406", "fusion.2408", "sort.11"))
