"""Pure fused-train-step rate at the E2E pipeline's OWN label shapes.

The committed pure-step number (runs/train_bench.json: 27.4 ms at batch 16)
uses the 8-instance bucket, but the e2e train pipeline runs the 16-instance
bucket (mosaic-4 merges up to 4 tiles' objects, data/augment.py collate
bucketing) — so "e2e as % of pure step" was comparing against the wrong
denominator. This measures the fused step (forward + assign + loss + grads +
optimizer + EMA) at nmax=16 with a typical 8-real-GT fill and at full fill,
for batch 16 and 64. Writes runs/train_bench_bucket16.json.
"""
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "examples" / "scripts"))

from bench_train import measure  # noqa: E402


def main():
    rows = []
    rec = {"rows": rows,
           "note": "pure fused step at the e2e pipeline's 16-instance bucket "
                   "(crowded geometry like real mosaic output); denominator "
                   "for the e2e-train efficiency claim"}
    out = ROOT / "runs" / "train_bench_bucket16.json"
    for kw in (dict(B=16, n_real=8), dict(B=16, n_real=16),
               dict(B=64, n_real=8)):
        try:
            rows.append(measure("segment", nmax=16, crowded=True, **kw))
        except Exception as e:  # tunnel remote-compile 413 on big programs
            rows.append({"error": repr(e)[:200], **kw})
        # write incrementally: a later row's tunnel failure must not lose
        # the earlier measurements (the r5h first run did exactly that)
        out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
