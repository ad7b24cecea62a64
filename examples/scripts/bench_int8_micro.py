"""Does XLA:TPU actually run s8 x s8 -> s32 convs at the int8 MXU rate?

The native w8a8 deploy path (nn/quant.py) measured only ~12% over bf16
end-to-end (runs/bench_int8_r4.json 9871 vs bench_headline_r4.json 8817
img/s) where the v5e datasheet promises 2x on the conv portion (394 int8
TOPS vs 197 bf16 TFLOPS). This isolates the primitive: representative
yolov8n-seg conv shapes, timed in-graph (fori_loop, carried dependency),
bf16 vs int8-with-quantize-epilogue vs raw int8 (pre-quantized inputs).

Writes runs/bench_int8_micro.json.
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import numpy as np


# (H, W, Cin, Cout, k, stride) — the FLOP-heavy layers of yolov8n-seg at 640px
SHAPES = [
    (320, 320, 16, 32, 3, 2),
    (160, 160, 32, 64, 3, 2),
    (80, 80, 64, 128, 3, 2),
    (80, 80, 64, 64, 3, 1),
    (40, 40, 128, 128, 3, 1),
    (20, 20, 256, 256, 3, 1),
]


def main(batch=128, iters=300):
    # honors JAX_PLATFORMS even when a site hook pre-imported jax (the bare
    # env var is void by then — the package __init__ mirrors it into config)
    import yolo_contour_regression_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    rows = []
    for (H, W, Ci, Co, k, s) in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (batch, H, W, Ci)).astype(np.float32))
        w = jnp.asarray(rng.uniform(-1, 1, (k, k, Ci, Co)).astype(np.float32))
        x8 = jnp.asarray(rng.integers(-127, 127, (batch, H, W, Ci), dtype=np.int8))
        w8 = jnp.asarray(rng.integers(-127, 127, (k, k, Ci, Co), dtype=np.int8))
        dn = ("NHWC", "HWIO", "NHWC")
        pad = [(k // 2, k // 2)] * 2

        def conv(xx, ww, pet=None):
            kw = dict(window_strides=(s, s), padding=pad, dimension_numbers=dn)
            if pet is not None:
                kw["preferred_element_type"] = pet
            return jax.lax.conv_general_dilated(xx, ww, **kw)

        @partial(jax.jit, static_argnames=("n", "mode"))
        def loop(x, w, n, mode):
            def body(i, acc):
                if mode == "bf16":
                    y = conv((x + acc * 1e-20).astype(jnp.bfloat16),
                             w.astype(jnp.bfloat16))
                    return acc + y.astype(jnp.float32).sum() * 1e-20
                if mode == "int8_raw":  # pre-quantized in/out, pure MXU probe
                    # carried dependency the compiler cannot fold away or
                    # hoist: one input pixel really changes per iteration,
                    # and the conv checksum's low bit feeds the carry
                    xi = x.at[0, 0, 0, 0].set((acc % 127).astype(jnp.int8))
                    y = conv(xi, w, pet=jnp.int32)
                    return acc + (y.sum() & 1)
                # deploy epilogue: quantize input, s8xs8->s32, dequant f32
                xq = jnp.clip(jnp.round((x + acc * 1e-20) * 12.7), -127, 127
                              ).astype(jnp.int8)
                y = conv(xq, w.astype(jnp.int8), pet=jnp.int32)
                return acc + (y.astype(jnp.float32) * (1 / 12.7)).sum() * 1e-20

            init = jnp.zeros((), jnp.int32 if mode == "int8_raw" else jnp.float32)
            return jax.lax.fori_loop(0, n, body, init)

        row = {"shape": [H, W, Ci, Co, k, s], "batch": batch}
        flops = 2 * batch * (H // s) * (W // s) * k * k * Ci * Co
        for mode in ("bf16", "int8_raw", "int8_deploy"):
            xx, ww = (x8, w8) if mode == "int8_raw" else (x, w)
            # warm BOTH static n values — n is a static arg, so the timed
            # n=iters+2 call would otherwise compile inside the window.
            # NB: timing must FETCH the value (float(...)) — on the tunneled
            # axon backend block_until_ready resolves at enqueue, not at
            # completion, and walls come out ~0.04 ms for 300 convs
            # (runs/queue_r4c.log try 3 walls_ms evidence)
            float(loop(xx, ww, 2, mode))
            float(loop(xx, ww, iters + 2, mode))
            # Differential timing over the tunnel: one dispatch costs O(ms)
            # with ms-scale jitter, so (long - short) is only meaningful when
            # iters*per_conv >> jitter (hence iters=300, ~10-50ms of compute)
            # AND we take the median of several pairs rather than one sample.
            diffs, walls = [], []
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop(xx, ww, iters + 2, mode))
                t1 = time.perf_counter()
                float(loop(xx, ww, 2, mode))
                t2 = time.perf_counter()
                diffs.append((t1 - t0) - (t2 - t1))
                walls.append((round((t1 - t0) * 1e3, 2), round((t2 - t1) * 1e3, 2)))
            per = sorted(diffs)[len(diffs) // 2] / iters
            row[mode] = {
                "ms": round(per * 1e3, 4),
                "tflops": round(flops / per / 1e12, 1) if per > 1e-9 else None,
                # raw (long, short) walls: if the long loop's wall does not
                # scale with n, the backend is not executing n body trips
                # and the differential is meaningless — keep the evidence
                "walls_ms": walls,
            }
        for other in ("int8_raw", "int8_deploy"):
            ms = row[other]["ms"]
            row[f"{other}_speedup"] = (
                round(row["bf16"]["ms"] / ms, 2) if ms > 1e-6 else None
            )
        print(json.dumps(row))
        rows.append(row)

    (ROOT / "runs" / "bench_int8_micro.json").write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
