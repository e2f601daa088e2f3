#!/usr/bin/env python
"""Interleaved A/B wall-clock comparison for perf claims on the shared box.

Shared-box noise swings wall numbers ±25-30% (CLAUDE.md), so back-to-back
runs of "before" then "after" routinely produce phantom speedups larger
than real ones.  This harness interleaves the two commands A B A B ... and
reports per-side medians and bests, so both sides sample the same noise
windows.  Methodology the project's perf claims are required to follow.

    python scripts/ab_bench.py --reps 7 --label-a old --label-b new \
        -- "python bench.py" "IP_BENCH_BATCH=8 python bench.py"

Each command runs under `sh -c`, so env prefixes and pipelines work.  Exit
status is nonzero if any rep fails.  Output: one human table plus one JSON
line (medians, bests, ratio) for pasting into docs/DESIGN.md.
"""

import argparse
import json
import statistics
import subprocess
import sys
import time


def _run(cmd: str) -> float:
    t0 = time.perf_counter()
    r = subprocess.run(["sh", "-c", cmd], stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        raise RuntimeError(f"command failed (rc={r.returncode}): {cmd}")
    return dt


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--warmup", type=int, default=1,
                    help="untimed warm-up reps per side (compile/page caches)")
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    ap.add_argument("cmds", nargs=2, metavar="CMD",
                    help="two shell commands to compare")
    args = ap.parse_args(argv)
    cmd_a, cmd_b = args.cmds

    for _ in range(args.warmup):
        _run(cmd_a)
        _run(cmd_b)

    ta, tb = [], []
    for rep in range(args.reps):
        # alternate order (AB, BA, AB, ...): a fixed order would hand one
        # side every cold cache / periodic-noise alignment systematically
        if rep % 2 == 0:
            ta.append(_run(cmd_a))
            tb.append(_run(cmd_b))
        else:
            tb.append(_run(cmd_b))
            ta.append(_run(cmd_a))
        print(f"rep {rep + 1}/{args.reps}: "
              f"{args.label_a}={ta[-1]:.3f}s {args.label_b}={tb[-1]:.3f}s",
              file=sys.stderr)

    med_a, med_b = statistics.median(ta), statistics.median(tb)
    out = {
        "label_a": args.label_a, "label_b": args.label_b,
        "reps": args.reps,
        "median_a_s": round(med_a, 4), "median_b_s": round(med_b, 4),
        "best_a_s": round(min(ta), 4), "best_b_s": round(min(tb), 4),
        "speedup_b_over_a": round(med_a / med_b, 3) if med_b else None,
    }
    print(f"{args.label_a}: median {med_a:.3f}s best {min(ta):.3f}s | "
          f"{args.label_b}: median {med_b:.3f}s best {min(tb):.3f}s | "
          f"{args.label_b}/{args.label_a} speedup {out['speedup_b_over_a']}x",
          file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
