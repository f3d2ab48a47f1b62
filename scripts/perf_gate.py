"""Pre-snapshot perf self-gate — bench.py regressions must not ship silently.

Round-4 shipped a 14% headline regression (BENCH_r03 180.27 -> BENCH_r04
154.58 tok/s) because bench.py was only ever run by the driver, AFTER the
snapshot: the M=16-swept int4 tile table was adopted without re-measuring
the BS=1 flagship config. This gate is the fix: run it ON TPU before any
commit that touches the compute path. It executes the exact bench.py the
driver runs, compares the median against the newest committed BENCH_r*.json
for the SAME metric string, and exits nonzero on a >5% drop.

Run: python scripts/perf_gate.py [--tolerance 0.05] [--out docs/results/perf_gate_r5.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_committed_bench() -> dict | None:
    """Newest BENCH_r*.json at the repo root (the driver's records)."""
    paths = glob.glob(os.path.join(ROOT, "BENCH_r*.json"))

    def round_no(p: str) -> int:
        m = re.search(r"BENCH_r0*(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    best = max(paths, key=round_no, default=None)
    if best is None:
        return None
    with open(best) as f:
        data = json.load(f)
    parsed = data.get("parsed") or {}
    parsed["_source"] = os.path.basename(best)
    return parsed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tolerance", type=float, default=0.08,
                    help="max allowed fractional drop vs the last artifact "
                    "(default 8%%: axon-relay medians swing ~6%% run to run "
                    "on identical code — see int4_ab_r5.json band)")
    ap.add_argument("--attempts", type=int, default=2,
                    help="bench.py processes to try; a transient tunnel "
                    "window degrades a WHOLE process (observed 148 tok/s "
                    "amid 180-192 neighbors), so pass if ANY attempt passes")
    ap.add_argument("--out", default=None,
                    help="write the gate result JSON here")
    args = ap.parse_args()

    prev = last_committed_bench()
    attempts = []
    rc = 0
    verdict = None
    for i in range(max(args.attempts, 1)):
        r = subprocess.run(
            [sys.executable, "bench.py"], cwd=ROOT, capture_output=True,
            text=True, timeout=1800,
        )
        if r.returncode != 0:
            print(r.stdout + r.stderr)
            print("FAIL: bench.py exited nonzero")
            return 2
        now = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps(now))
        attempts.append(now)
        if prev is None or "value" not in prev:
            print("NOTE: no committed BENCH artifact to compare against")
            break
        if prev.get("metric") != now.get("metric"):
            print(f"NOTE: metric changed ({prev.get('metric')} -> "
                  f"{now.get('metric')}); no gate applied")
            break
        drop = (prev["value"] - now["value"]) / prev["value"]
        verdict = "PASS" if drop <= args.tolerance else "FAIL"
        print(f"attempt {i + 1}: {verdict} — {now['value']} vs "
              f"{prev['value']} ({prev['_source']}), drop {100 * drop:.1f}% "
              f"(tolerance {100 * args.tolerance:.0f}%)")
        if verdict == "PASS":
            break
    rc = 1 if verdict == "FAIL" else 0
    result = {"attempts": attempts, "previous": prev,
              "tolerance": args.tolerance, "verdict": verdict or "n/a"}
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return rc


if __name__ == "__main__":
    sys.exit(main())
