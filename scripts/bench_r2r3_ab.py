"""Fixed-commit A/B: r2 code vs r3(+r4) code, one chip, one session
(VERDICT r3 Weak #1 — separate the decode regression from environment drift).

Alternates subprocess probes (``bench_r2r3_probe.py``) over the two source
trees so both versions share the session; each probe measures with ≥15 reps.
Results append to a JSONL for the BASELINE.md verdict.

Usage: python scripts/bench_r2r3_ab.py [--rounds 3] [--reps 15] [--out FILE]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R2 = os.path.join(REPO, ".ab_r2")
PROBE = os.path.join(REPO, "scripts", "bench_r2r3_probe.py")


def run_probe(tree: str, mode: str, reps: int) -> dict:
    t0 = time.time()
    # keep the inherited env: the axon TPU plugin registers via the
    # PYTHONPATH sitecustomize; the probe's sys.path.insert(0, tree) already
    # shadows any repo entry for the package import
    out = subprocess.run(
        [sys.executable, PROBE, tree, mode, str(reps)],
        capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        rec = json.loads(line)
    except Exception:
        rec = {"tree": tree, "mode": mode, "error": out.stderr[-2000:]}
    rec["wall_s"] = round(time.time() - t0, 1)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--out", default=os.path.join(REPO, "scripts", "r2r3_ab.jsonl"))
    args = ap.parse_args()

    trees = {"r2": R2, "r4": REPO}
    with open(args.out, "a") as f:
        for mode in ("bf16", "int8_11b"):
            for rnd in range(args.rounds):
                for name, tree in trees.items():
                    rec = run_probe(tree, mode, args.reps)
                    rec.update(label=name, round=rnd)
                    f.write(json.dumps(rec) + "\n")
                    f.flush()
                    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
