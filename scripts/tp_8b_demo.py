"""8B-through-Engine tensor-parallel demonstration (round-1 VERDICT #10).

The single-chip-impossible BASELINE configs — Llama-3.1-8B int8, and 8B
int4 + EAGLE-lite — OOM on one 16 GB v5e chip (docs/RESULTS.md
"Llama-3.1-8B on one chip"). This script runs them end-to-end through
`Engine(mesh=...)` on a virtual CPU mesh (same GSPMD program the real
multi-chip run would compile) and records the artifact the RESULTS claims
point at: per-device parameter bytes halve under TP=2, the engine
generates, and repeat generation is deterministic.

Usage:
    python scripts/tp_8b_demo.py [--tp 2] [--new-tokens 8] [--out PATH]

Reference analogue: none — multi-GPU is Phase 4C "Planned"
(/root/reference/README.md:393-395); this exercises the green-field TP
path of SURVEY.md §2.9 at the real 8B scale.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shard_bytes_per_device(params) -> dict:
    """Max/total addressable-shard bytes per device over the param tree."""
    import jax

    per_dev: dict = {}
    for leaf in jax.tree_util.tree_leaves(params):
        for s in getattr(leaf, "addressable_shards", []):
            d = str(s.device)
            per_dev[d] = per_dev.get(d, 0) + s.data.nbytes
    return per_dev


def run_config(name: str, cfg_kwargs: dict, tp: int, new_tokens: int) -> dict:
    import jax

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    print(f"[{name}] building engine (8B init)...", flush=True)
    t0 = time.perf_counter()
    eng = Engine(
        EngineConfig(
            base_model="llama-3.1-8b",
            implementation="hf",
            greedy=True,
            max_new_tokens=new_tokens,
            max_seq_len=128,
            mesh_shape={"model": tp},
            **cfg_kwargs,
        )
    )
    t_init = time.perf_counter() - t0

    per_dev = shard_bytes_per_device(eng.target.params)
    total_gb = sum(per_dev.values()) / 2**30
    max_dev_gb = max(per_dev.values()) / 2**30

    print(f"[{name}] init {t_init:.0f}s; params/device "
          f"{max_dev_gb:.2f} GB; generating...", flush=True)
    prompt = "Tensor parallel eight billion parameter demonstration run."
    t0 = time.perf_counter()
    r1 = eng.generate(prompt, max_new_tokens=new_tokens)
    t_first = time.perf_counter() - t0  # includes compile
    t0 = time.perf_counter()
    r2 = eng.generate(prompt, max_new_tokens=new_tokens)
    t_warm = time.perf_counter() - t0

    assert r1["generated_ids"] == r2["generated_ids"], "nondeterministic TP decode"
    assert r1["generated_tokens"] == new_tokens

    rec = {
        "config": name,
        "tp": tp,
        "devices": [str(d) for d in jax.devices()[:tp]],
        "param_bytes_total_gb": round(total_gb, 3),
        "param_bytes_max_per_device_gb": round(max_dev_gb, 3),
        "tp_balance": round(max_dev_gb * tp / max(total_gb, 1e-9), 3),
        "generated_tokens": r1["generated_tokens"],
        "deterministic_repeat": True,
        "init_s": round(t_init, 1),
        "first_generate_s_incl_compile": round(t_first, 1),
        "warm_generate_s": round(t_warm, 1),
        "draft_mode": r1["draft_mode"],
        "quantization": r1["quantization"],
    }
    print(json.dumps(rec))
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--new-tokens", type=int, default=8)
    ap.add_argument("--out", default="docs/results/tp_8b_virtualmesh.json")
    ap.add_argument(
        "--configs",
        default="int8,int4_eagle",
        help="comma list: int8 (8B int8 baseline), int4_eagle (8B int4 + EAGLE)",
    )
    args = ap.parse_args()

    # Virtual CPU mesh: jax.config.update works even though sitecustomize
    # pre-imported jax (env vars would be too late — see tests/conftest.py).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(args.tp, 2))

    # quantized_init: init directly in quantized form — same per-device
    # bytes and compute as a quantized checkpoint, without materializing
    # 16 GB of bf16 on the host first (transformer.init_params_quantized).
    catalogue = {
        "int8": {"quantization": "int8", "quantize_embed": True,
                 "quantized_init": True, "draft_model": None},
        "int4_eagle": {"quantization": "int4", "quantize_embed": True,
                       "quantized_init": True, "draft_model": None,
                       "draft_mode": "eagle", "max_draft": 2},
    }
    results = [
        run_config(n, catalogue[n], args.tp, args.new_tokens)
        for n in args.configs.split(",")
    ]

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "note": (
            "single-chip-impossible 8B configs run through Engine(mesh) on a "
            "virtual CPU mesh — correctness + per-device memory artifact for "
            "the 'needs 2-chip TP' rows in docs/RESULTS.md"
        ),
        "results": results,
    }, indent=2) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
