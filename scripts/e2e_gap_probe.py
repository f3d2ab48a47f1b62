"""Where does nonspec 3B-int4 BS=1 e2e lose time vs its 326 tok/s step rate?

batch_scaling_r5_int4.json measured the raw baseline step at 3.06 ms (B=1,
sum-checked), i.e. 326 tok/s — yet headline_r5.json's e2e median is 181.8
(best 205.4) and round-3 recorded 233.0. 64 tokens at 326 tok/s is 196 ms;
the e2e window adds init+H2D+prefill+1 completion RTT. This probe splits the
measured window so the biggest non-step term is attackable:

  total_ms        — generate() wall (the tokens_per_sec window)
  decode_ms       — generation_time_ms from the result (post-prefill)
  prefill_ms      — total - decode (init + H2D + prefill dispatch)
  loop_ms_per_tok — decode_ms / generated (compare: 3.06 ms step)

Run: python scripts/e2e_gap_probe.py [--reps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPECDX_DETERMINISTIC", "1")

PROMPT = "The quick brown fox jumps over the lazy dog. " * 3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--out", default="docs/results/serving/e2e_gap_r5.json")
    args = ap.parse_args()

    import jax

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    small = args.small or jax.default_backend() == "cpu"
    eng = Engine(EngineConfig(
        base_model="llama-tiny" if small else "llama-3.2-3b",
        draft_model=None,
        implementation="hf",
        max_new_tokens=64,
        greedy=True,
        quantization=None if small else "int4",
        quantize_embed=not small,
        quantized_init=not small,
        max_seq_len=512,
    ))
    eng.generate(PROMPT, max_new_tokens=64)  # compile
    rows = []
    for _ in range(args.reps):
        r = eng.generate(PROMPT, max_new_tokens=64)
        total = r["latency_ms"]
        decode = r["generation_time_ms"]
        n = r["generated_tokens"]
        rows.append({
            "total_ms": round(total, 2),
            "decode_ms": round(decode, 2),
            "prefill_ms": round(total - decode, 2),
            "generated": n,
            "loop_ms_per_tok": round(decode / max(n, 1), 3),
            "tok_s": round(r["tokens_per_sec"], 1),
        })
        print(json.dumps(rows[-1]))
    med = sorted(rows, key=lambda x: x["tok_s"])[len(rows) // 2]
    out = {"config": "nonspec 3B int4 qembed BS=1 64tok" if not small
           else "small", "median": med, "rows": rows,
           "step_rate_ref": "batch_scaling_r5_int4.json B=1 step_ms 3.063"}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"median_tok_s": med["tok_s"],
                      "median_prefill_ms": med["prefill_ms"],
                      "median_loop_ms_per_tok": med["loop_ms_per_tok"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
