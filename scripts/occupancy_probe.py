"""Serving occupancy probe: attribute the gap to the n_slots x single-lane bound.

Round-2 measured 720.9 tok/s aggregate at 16 slots vs a ~2,850 tok/s bound
(16 x 178 single-lane) and attributed the loss to "admission prefill sharing
the device plus ramp-up/down" without measuring it. This probe drives
ContinuousBatcher directly (no HTTP noise) with the occupancy accounting in
core/batching.py::BatcherStats and adds synchronous micro-phases:

  - decode chunk wall at full occupancy (the real per-slot decode rate — the
    bound must be computed from THIS, not the B=1 rate),
  - one admission wall (prefill + splice, device-synced),
  - the drain run's poll-by-poll occupancy trace.

Run: python scripts/occupancy_probe.py [--small] [--requests 96] [--slots 16]
Artifact: docs/results/serving/occupancy_r3.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--requests", type=int, default=96)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--poll-every", type=int, default=8)
    ap.add_argument("--draft", action="store_true", help="speculative (3B+1B)")
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--out", default="docs/results/serving/occupancy_r3.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.batching import ContinuousBatcher
    from llm_inference_lab_tpu.core.engine import Engine

    small = args.small or jax.default_backend() == "cpu"
    cfg = EngineConfig(
        base_model="llama-tiny" if small else "llama-3.2-3b",
        draft_model=(
            ("llama-tiny" if small else "llama-3.2-1b") if args.draft else None
        ),
        implementation="hf",
        max_draft=args.k,
        max_new_tokens=args.max_tokens,
        quantization=None if small else "int8",
        quantize_embed=not small,
        max_seq_len=256,
    )
    eng = Engine(cfg)
    b = ContinuousBatcher(eng, n_slots=args.slots, poll_every=args.poll_every)

    prompt = "Probe request: the quick brown fox jumps over the lazy dog"

    # --- phase microbenchmarks (synchronous) ---------------------------
    def sync():
        jax.block_until_ready(b.state.lengths)
        np.asarray(b.state.steps)

    # One admission, device-synced.
    rid = b.submit(prompt, max_new_tokens=args.max_tokens)
    b._admit_pending()
    sync()
    t0 = time.perf_counter()
    rid = b.submit(prompt, max_new_tokens=args.max_tokens)
    b._admit_pending()
    sync()
    admit_one_ms = (time.perf_counter() - t0) * 1e3

    # Decode chunk at occupancy 2 (compile + then measure).
    b.step_chunk(args.poll_every)
    sync()
    t0 = time.perf_counter()
    b.step_chunk(args.poll_every)
    sync()
    chunk_lo_ms = (time.perf_counter() - t0) * 1e3

    # Fill all slots, measure chunk at full occupancy.
    for _ in range(args.slots - 2):
        b.submit(prompt, max_new_tokens=args.max_tokens)
    b._admit_pending()
    sync()
    n_occ = sum(s is not None for s in b._slots)
    t0 = time.perf_counter()
    b.step_chunk(args.poll_every)
    sync()
    chunk_full_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    for _ in range(4):
        b.step_chunk(args.poll_every)
    sync()
    chunk_full_ms = min(
        chunk_full_ms, (time.perf_counter() - t0) * 1e3 / 4
    )
    # Admission wall while the batch is full-minus-one (the serving regime):
    # retire everything first by draining.
    b.run()

    # --- the drain run with trace --------------------------------------
    b.stats.__init__()  # reset counters
    b.start_trace()
    for i in range(args.requests):
        b.submit(f"{prompt} #{i}", max_new_tokens=args.max_tokens)
    t0 = time.perf_counter()
    b.run()
    wall = time.perf_counter() - t0
    rep = b.stats.report(args.slots)
    toks = rep["committed_tokens"]

    step_ms_full = chunk_full_ms / args.poll_every
    lane_tok_s = 1e3 / step_ms_full  # per-slot decode rate at full occupancy
    bound = lane_tok_s * args.slots
    out = {
        "config": {
            "base": cfg.base_model, "draft": cfg.draft_model,
            "slots": args.slots, "poll_every": args.poll_every,
            "requests": args.requests, "max_tokens": args.max_tokens,
            "backend": jax.default_backend(),
        },
        "micro": {
            "admit_one_ms": round(admit_one_ms, 2),
            "chunk_ms_occupancy2": round(chunk_lo_ms, 2),
            "chunk_ms_full": round(chunk_full_ms, 2),
            "step_ms_full": round(step_ms_full, 3),
            "lane_tok_s_full": round(lane_tok_s, 1),
            "bound_tok_s": round(bound, 1),
        },
        "drain": {
            "wall_s": round(wall, 3),
            "tokens": toks,
            "aggregate_tok_s": round(toks / wall, 1),
            "pct_of_bound": round(100 * toks / wall / bound, 1),
            **rep,
        },
        "trace": b.trace,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "trace"}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
