"""On-hardware serving stress run (reference stress_test_long_run.py model,
extended to the continuous-batching serving path). Writes the JSON report to
docs/results/stress/ for the archive.

    python scripts/stress_harness.py                  # 3B+1B int8 on TPU
    python scripts/stress_harness.py --small          # llama-tiny pair
    python scripts/stress_harness.py --requests 400 --slots 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="llama-tiny pair")
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--max-wall-s", type=float, default=600.0)
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from llm_inference_lab_tpu.bench.stress import StressConfig, run_stress
    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    if args.small:
        base, draft, quant = "llama-tiny", "llama-tiny", None
    else:
        base, draft, quant = "llama-3.2-3b", "llama-3.2-1b", "int8"
    cfg = EngineConfig(
        base_model=base, draft_model=draft, implementation="hf",
        max_draft=4, max_new_tokens=32, max_seq_len=1024,
        quantization=quant,
        **({"kv_layout": "paged", "kv_page_size": 64} if args.paged else {}),
    )
    eng = Engine(cfg)
    report = run_stress(
        eng,
        StressConfig(total_requests=args.requests, n_slots=args.slots,
                     max_wall_s=args.max_wall_s),
    )
    report["config"] = {"base": base, "draft": draft, "quant": quant,
                        "slots": args.slots, "paged": args.paged}
    print(json.dumps({k: v for k, v in report.items() if k != "windows"},
                     indent=2))
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "results", "stress",
        f"stress_{'tiny' if args.small else '3b1b'}"
        f"{'_paged' if args.paged else ''}.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out)
    ok = (report["completed"] == report["total_requested"]
          and report["all_nonempty"]
          and report["latency_degradation"] < 2.0)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
