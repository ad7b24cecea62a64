"""Scale ladder benchmark: yolov8{n,s,m}-seg e2e throughput at 640px
(VERDICT r2 next-#6; the reference publishes the full n->x table,
README.md:140-144). Drives bench.py in subprocesses with BENCH_MODEL /
BENCH_BATCH; records runs/bench_scales.json.

Reference A100-TensorRT anchors (README.md:140-142):
  n: 1.21 ms -> ~826 img/s;  s: 1.47 ms -> ~680;  m: 2.18 ms -> ~459.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]

A100_ANCHOR = {
    "yolov8n-seg": 826.0,  # 1.21 ms A100-TensorRT (reference README.md:140)
    "yolov8s-seg": 680.0,  # 1.47 ms (:141)
    "yolov8m-seg": 459.0,  # 2.18 ms (:142)
    "yolov8l-seg": 358.0,  # 2.79 ms (:143)
    "yolov8x-seg": 249.0,  # 4.02 ms (:144)
}
# larger models need smaller batch ladders to bound compile size on the
# tunneled chip
LADDER = {
    "yolov8n-seg": (128, 64, 32),
    "yolov8s-seg": (128, 64, 32),
    "yolov8m-seg": (64, 32, 16),
    "yolov8l-seg": (32, 16, 8),
    "yolov8x-seg": (32, 16, 8),
}


def run_one(model: str, int8: str = "") -> dict:
    """int8: "" = bf16, "1" = full w8a8, "auto" = selective (nn/quant.py
    int8_wins: only the deep/narrow layers where the micro-bench says the
    int8 composition beats bf16)."""
    for batch in LADDER[model]:
        env = dict(os.environ, BENCH_MODEL=model, BENCH_BATCH=str(batch))
        if int8:
            env["BENCH_INT8"] = int8
        try:
            r = subprocess.run(
                [sys.executable, str(ROOT / "bench.py")],
                env=env, capture_output=True, text=True, timeout=1200,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            rec = json.loads(line)
            if r.returncode == 0 and rec.get("value", 0) > 0:
                rec["vs_a100_anchor"] = round(rec["value"] / A100_ANCHOR[model], 2)
                return rec
        except (subprocess.TimeoutExpired, json.JSONDecodeError, IndexError):
            continue
    return {"metric": f"{model}_e2e_throughput_640px", "value": 0.0,
            "error": "all batch ladder attempts failed"}


def main():
    # --int8 runs the native w8a8 path; --out writes elsewhere than the
    # tracked runs/bench_scales.json (so queue waves never clobber it)
    args = sys.argv[1:]
    int8 = "auto" if "--int8auto" in args else ("1" if "--int8" in args else "")
    out = ROOT / "runs" / (
        "bench_int8auto_scales.json" if int8 == "auto"
        else "bench_int8_scales.json" if int8 else "bench_scales.json"
    )
    if "--out" in args:
        out = Path(args[args.index("--out") + 1])
        args = [a for i, a in enumerate(args)
                if a != "--out" and args[max(i - 1, 0)] != "--out"]
    models = [a for a in args if not a.startswith("--")] or list(LADDER)
    rows = [run_one(m, int8=int8) for m in models]
    rec = {"rows": rows, "int8": int8,
           "note": "e2e pipeline (pre+infer+decode+NMS), fused "
           "deploy variables, in-graph fori_loop timing (see bench.py)"}
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
