"""Prefix-caching demo: admission (prefill) latency with a shared prefix.

The serving win of automatic prefix caching is time-to-first-token: when
requests share a long prompt prefix (system prompt, few-shot header), the
cached run prefills only the unique suffix. This script admits a stream of
requests sharing a long prefix through the ContinuousBatcher twice — with
prefix caching off and on — and reports per-request admission latency and
tokens reused.

Run (TPU or CPU):
    python scripts/prefix_caching_demo.py [--small] [--prefix-tokens 1500]

Artifact: docs/results/prefix_caching/prefix_demo.json.
No reference analogue (the reference has no KV reuse across requests).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(prefix_on: bool, args, prompts) -> dict:
    import jax

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.batching import ContinuousBatcher
    from llm_inference_lab_tpu.core.engine import Engine

    small = args.small or jax.default_backend() == "cpu"
    eng = Engine(
        EngineConfig(
            base_model="llama-tiny" if small else "llama-3.2-1b",
            draft_model=None,
            draft_mode="ngram",
            max_draft=4,
            implementation="hf",
            greedy=True,
            max_new_tokens=args.new_tokens,
            max_seq_len=args.max_seq,
            quantization=None if small else "int8",
            quantize_embed=not small,
            kv_layout="paged",
            kv_page_size=args.page,
            prefix_caching=prefix_on,
        )
    )
    b = ContinuousBatcher(eng, n_slots=1)  # serialize: isolate admission cost

    # Warm the admission + step executables: warm[0] populates the prefix
    # cache (full-prompt prefill shape); warm[1] has a DIFFERENT suffix so
    # it compiles the suffix-shaped cached prefill the timed requests use.
    # Without this the first timed request would pay jit compilation in one
    # mode but not the other.
    for p in (prompts[0], args.warm_prompt):
        b.submit(p)
        b.run()

    lat_ms, rids = [], []
    for p in prompts:
        rids.append(b.submit(p))
        t0 = time.perf_counter()
        b._admit_pending()  # the jitted prefill — what prefix caching skips
        jax.block_until_ready(b.state.lengths)
        # Materialize to beat relay pipelining (memory: axon quirk #3).
        _ = int(jax.device_get(b.state.lengths)[0])
        lat_ms.append((time.perf_counter() - t0) * 1e3)
        b.run()
    results = [b._done[r].result for r in rids]
    reused = [r["prompt_tokens_reused"] for r in results]
    return {
        "prefix_caching": prefix_on,
        "admission_ms_per_request": [round(x, 2) for x in lat_ms],
        "admission_ms_median": round(sorted(lat_ms)[len(lat_ms) // 2], 2),
        "prompt_tokens_reused": reused,
        "cache_hits_pages": getattr(b.allocator, "hits", 0),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--prefix-tokens", type=int, default=1500)
    ap.add_argument("--requests", type=int, default=6)
    ap.add_argument("--new-tokens", type=int, default=16)
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--out", default="docs/results/prefix_caching/prefix_demo.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars are too late here: "
                    "sitecustomize pre-imports jax with JAX_PLATFORMS=axon)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # A long shared "system prompt" + short unique suffixes. ByteTokenizer
    # (offline env) is 1 token/char; real tokenizers just shift the ratio.
    shared = ("You are a helpful, precise assistant. Follow the style guide. "
              * 200)[: args.prefix_tokens]
    prompts = [f"{shared} Question {i}: what follows?" for i in range(args.requests)]
    args.warm_prompt = f"{shared} Question w: what follows?"

    off = run_mode(False, args, prompts)
    on = run_mode(True, args, prompts)
    speedup = (
        off["admission_ms_median"] / on["admission_ms_median"]
        if on["admission_ms_median"]
        else float("nan")
    )
    import jax

    payload = {
        "note": (
            "admission (prefill) latency for requests sharing a "
            f"{args.prefix_tokens}-token prefix; prefix caching prefills "
            "only the unique suffix"
        ),
        "backend": jax.default_backend(),
        "prefix_tokens": args.prefix_tokens,
        "off": off,
        "on": on,
        "admission_speedup_median": round(speedup, 2),
    }
    print(json.dumps(payload))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=2) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
