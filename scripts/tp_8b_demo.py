"""8B-through-Engine tensor-parallel demonstration (round-1 VERDICT item 10).

The single-chip-impossible configs recorded in docs/RESULTS.md (8B int8;
8B int4 + EAGLE — both OOM on one 16 GB v5e) run here end-to-end through
`Engine(mesh=...)` on a virtual CPU mesh, proving the TP path is real, not
asserted: params shard Megatron-style over the model axis, the spec step
compiles and runs, and per-device parameter bytes are half the total.

    python scripts/tp_8b_demo.py              # both configs, model=2 mesh
    python scripts/tp_8b_demo.py --tp 4
    python scripts/tp_8b_demo.py --config int8-pair

Artifact: docs/results/tp8b/tp_demo.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _param_bytes(tree) -> int:
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += leaf.size * leaf.dtype.itemsize
    return total


def _shard_bytes(tree) -> int:
    """Bytes of one device's addressable shards (device 0)."""
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            for s in leaf.addressable_shards:
                if s.device == jax.devices()[0]:
                    total += s.data.size * s.data.dtype.itemsize
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total


def run_config(name: str, tp: int) -> dict:
    import jax

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine
    from llm_inference_lab_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=1, model=tp)
    if name == "int8-pair":
        cfg = EngineConfig(
            base_model="llama-3.1-8b", draft_model="llama-3.2-1b",
            implementation="hf", quantization="int8", max_draft=4,
            max_new_tokens=8, max_seq_len=256, shard_draft=True,
        )
    elif name == "int4-eagle":
        cfg = EngineConfig(
            base_model="llama-3.1-8b", draft_model=None,
            implementation="hf", quantization="int4", max_draft=4,
            max_new_tokens=8, max_seq_len=256, draft_mode="eagle",
        )
    else:
        raise ValueError(name)

    t0 = time.perf_counter()
    eng = Engine(cfg, mesh=mesh)
    build_s = time.perf_counter() - t0
    total_b = _param_bytes(eng.target.params)
    dev0_b = _shard_bytes(eng.target.params)

    t1 = time.perf_counter()
    r = eng.generate("tensor parallel eight billion parameter demonstration")
    gen_s = time.perf_counter() - t1
    out = {
        "config": name,
        "tp": tp,
        "generated_tokens": r["generated_tokens"],
        "acceptance_rate": r["acceptance_rate"],
        "steps": r["steps"],
        "param_gb_total": round(total_b / 1e9, 3),
        "param_gb_device0": round(dev0_b / 1e9, 3),
        "tp_ratio": round(dev0_b / total_b, 3),
        "build_s": round(build_s, 1),
        "generate_s": round(gen_s, 1),
        "backend": jax.default_backend(),
        "ok": r["generated_tokens"] > 0,
    }
    # Determinism: a second generate must match the first.
    r2 = eng.generate("tensor parallel eight billion parameter demonstration")
    out["deterministic"] = r2["generated_ids"] == r["generated_ids"]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--config", choices=("int8-pair", "int4-eagle", "all"),
                    default="all")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    # Force the virtual CPU mesh BEFORE any backend-initializing call
    # (jax.default_backend() would lock in the axon/TPU backend — and the
    # TPU is single-tenant). Set SPECDX_TP_DEMO_TPU=1 to run on real chips.
    if os.environ.get("SPECDX_TP_DEMO_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.tp, 2))

    names = (["int8-pair", "int4-eagle"] if args.config == "all"
             else [args.config])
    rows = []
    for n in names:
        row = run_config(n, args.tp)
        print(json.dumps(row), flush=True)
        rows.append(row)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "results", "tp8b", "tp_demo.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote", out)
    return 0 if all(r["ok"] and r["deterministic"] for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
