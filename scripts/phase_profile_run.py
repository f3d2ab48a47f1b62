"""TPU-run artifact for the per-phase profiler (round-3/4 VERDICT item).

Runs the headline config (3B target + 1B draft, K=1, int4+qembed) with
profiling enabled and saves `StructuredProfiler.summary()` — including the
`phase_ms` draft/verify/commit attribution the reference ships in its
user-facing profiler (reference structured_profiler.py:88-156) — as the
committed evidence that `--profile` carries the breakdown on real hardware.

Run: python scripts/phase_profile_run.py [--small]
Artifact: docs/results/serving/phase_profile_r5.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPECDX_DETERMINISTIC", "1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--out",
                    default="docs/results/serving/phase_profile_r5.json")
    args = ap.parse_args()

    import jax

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    small = args.small or jax.default_backend() == "cpu"
    eng = Engine(EngineConfig(
        base_model="llama-tiny" if small else "llama-3.2-3b",
        draft_model="llama-tiny" if small else "llama-3.2-1b",
        implementation="hf",
        max_draft=1,
        max_new_tokens=32,
        greedy=True,
        quantization=None if small else "int4",
        quantize_embed=not small,
        quantized_init=not small,
        max_seq_len=512,
        profile=True,
    ))
    r = eng.generate("The quick brown fox jumps over the lazy dog. " * 3,
                     max_new_tokens=32)
    s = eng.profiler.summary()
    out = {
        "config": "3B+1B K=1 int4 qembed BS=1" if not small else "small",
        "backend": jax.default_backend(),
        "tokens_per_sec": round(r["tokens_per_sec"], 1),
        "profiler_summary": s,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"phase_ms": s["phase_ms"],
                      "step_ms": s["step_ms"]}))
    assert s["phase_ms"] and "draft_ms" in s["phase_ms"], s["phase_ms"]
    return 0


if __name__ == "__main__":
    sys.exit(main())
