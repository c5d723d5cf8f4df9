"""Paired A/B benchmark driver: runs bench.py in subprocesses with and
without an env override, in ABBA order (cancels slow drift through the
remote-TPU tunnel), and prints per-arm stats + the delta.

Used for the trace-time kill switches (YOLO_TPU_TRAIN_PAIRS,
YOLO_TPU_PACKED_TRAIN, YOLO_TPU_STEM_TRAIN, ...) whose effect must be
judged at the FULL bench step, not in isolation — docs/performance.md's
"isolated-win erosion" rule. Example:

    BENCH_MODE=train python scripts/ab_bench.py --flip YOLO_TPU_TRAIN_PAIRS=0 --reps 2

runs [A B B A] x reps where A = current defaults and B = the flipped env.
Each run is its own process (one JAX process at a time on this host; the
jit cache makes repeat compiles free).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(extra_env: dict[str, str]) -> float:
    env = dict(os.environ, **extra_env)
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          capture_output=True, text=True, env=env, cwd=REPO)
    if proc.returncode != 0:
        raise SystemExit(f"bench.py failed:\n{proc.stdout}\n{proc.stderr}")
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return float(json.loads(line)["value"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flip", required=True, metavar="KEY=VAL",
                    help="env override defining the B arm")
    ap.add_argument("--reps", type=int, default=2,
                    help="number of ABBA blocks (default 2 -> 4+4 runs)")
    args = ap.parse_args()
    key, _, val = args.flip.partition("=")
    b_env = {key: val}

    a_vals: list[float] = []
    b_vals: list[float] = []
    for block in range(args.reps):
        for arm in ("A", "B", "B", "A"):
            v = run_bench({} if arm == "A" else b_env)
            (a_vals if arm == "A" else b_vals).append(v)
            print(f"block {block} arm {arm}: {v:.1f}", flush=True)

    ma, mb = statistics.mean(a_vals), statistics.mean(b_vals)
    sa = statistics.stdev(a_vals) if len(a_vals) > 1 else 0.0
    sb = statistics.stdev(b_vals) if len(b_vals) > 1 else 0.0
    print(f"A (default):      {ma:8.1f} +- {sa:.1f}  {a_vals}")
    print(f"B ({args.flip}): {mb:8.1f} +- {sb:.1f}  {b_vals}")
    print(f"A/B = {ma / mb:.4f}  (A - B = {ma - mb:+.1f})")


if __name__ == "__main__":
    main()
