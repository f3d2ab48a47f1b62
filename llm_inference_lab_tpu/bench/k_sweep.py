"""Comprehensive K-sweep benchmark harness.

Reference parity: scripts/comprehensive_k_sweep.py (the reference's primary
benchmark, 1372 LoC): 10-prompt suite (:113-124), per-K pipeline cache +
warmup (:336-374), batched iteration via generate_batch (:443-560), graceful
per-K failure records (:380-438), SPECDX dry-run synthetic mode (:261-291),
CSV + JSON results with system info and kernel-backend audit
(save_results :1016-1060), throughput/acceptance plots (:1063-1160).
"""

from __future__ import annotations

import csv
import json
import os
import platform
import statistics
import time
from typing import Any, Dict, List, Optional

import jax

from llm_inference_lab_tpu.config import EngineConfig, EnvFlags
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.ops.registry import registry

# The reference's 10-prompt suite shape: short factual/creative prompts
# (comprehensive_k_sweep.py:113-124). Content differs; coverage matches.
PROMPT_SUITE = [
    "The future of artificial intelligence is",
    "In a small village by the sea, there lived",
    "The most important scientific discovery of the century",
    "Climate change affects our planet by",
    "The recipe for a perfect day starts with",
    "Once upon a time in a distant galaxy",
    "The key to learning a new language is",
    "Modern computer architecture relies on",
    "The history of mathematics begins with",
    "A balanced approach to work and life means",
]


def system_info() -> Dict[str, Any]:
    dev = jax.devices()[0]
    return {
        "platform": platform.platform(),
        "python": platform.python_version(),
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "device_count": jax.device_count(),
        "kernel_backends": {
            op: entries[0]["backend"] for op, entries in registry.info().items()
        },
        "env_flags": {k: v for k, v in os.environ.items() if k.startswith("SPECDX_")},
    }


def _stats(xs: List[float]) -> Dict[str, float]:
    if not xs:
        return {"mean": float("nan"), "std": float("nan"), "median": float("nan")}
    return {
        "mean": statistics.fmean(xs),
        "std": statistics.pstdev(xs) if len(xs) > 1 else 0.0,
        "median": statistics.median(xs),
    }


def run_k_sweep(
    base_model: str = "gpt2",
    draft_model: Optional[str] = "distilgpt2",
    implementation: str = "fake",
    max_k: int = 4,
    max_new_tokens: int = 64,
    iterations: int = 3,
    batch_size: int = 0,
    policy: str = "longest_prefix",
    quantization: Optional[str] = None,
    output_dir: Optional[str] = None,
    seed: int = 0,
    prompts: Optional[List[str]] = None,
) -> Dict[str, Any]:
    flags = EnvFlags.from_env()
    prompts = prompts or PROMPT_SUITE
    # SPECDX_BATCH_SIZE (reference SPECDEC_BATCH_SIZE,
    # comprehensive_k_sweep.py:444) — explicit argument wins.
    batch_size = batch_size or flags.batch_size
    if flags.dry_run:
        # Synthetic results without touching the device (reference
        # SPECDEC_DRY_RUN, comprehensive_k_sweep.py:261-291).
        summary = {
            f"k={k}": {
                "tokens_per_sec": {"mean": 100.0 / k, "std": 0.0, "median": 100.0 / k},
                "acceptance_rate": {"mean": 0.5, "std": 0.0, "median": 0.5},
                "dry_run": True,
            }
            for k in range(1, max_k + 1)
        }
        return {"system_info": system_info(), "summary_results": summary}

    summary: Dict[str, Any] = {}
    detailed: List[Dict[str, Any]] = []
    for k in range(1, max_k + 1):
        try:
            eng = Engine(
                EngineConfig(
                    base_model=base_model,
                    draft_model=draft_model,
                    implementation=implementation,
                    max_draft=k,
                    max_new_tokens=max_new_tokens,
                    policy=policy,
                    quantization=quantization,
                    seed=seed,
                )
            )
            # Warmup with the MEASUREMENT shapes (batch size and max_new are
            # static under jit — a mismatched warmup leaves compilation
            # inside the first timed iteration).
            bs0 = batch_size or len(prompts)
            eng.generate_batch(prompts[:bs0], max_new_tokens=max_new_tokens)
            tok_s: List[float] = []
            agg_tok_s: List[float] = []
            acc: List[float] = []
            lat: List[float] = []
            for it in range(iterations):
                bs = batch_size or len(prompts)
                for i in range(0, len(prompts), bs):
                    rs = eng.generate_batch(prompts[i : i + bs])
                    for r in rs:
                        tok_s.append(r["tokens_per_sec"])
                        acc.append(r["acceptance_rate"])
                        lat.append(r["generation_time_ms"] / max(r["steps"], 1))
                        detailed.append(
                            {"k": k, "iteration": it, **{
                                key: r[key]
                                for key in (
                                    "batch_index", "generated_tokens", "tokens_per_sec",
                                    "acceptance_rate", "steps", "generation_time_ms",
                                )
                            }}
                        )
                    agg_tok_s.append(rs[0]["batch_metrics"]["aggregate_tokens_per_sec"])
            summary[f"k={k}"] = {
                "tokens_per_sec": _stats(tok_s),
                "aggregate_tokens_per_sec": _stats(agg_tok_s),
                "acceptance_rate": _stats(acc),
                "step_latency_ms": _stats(lat),
                "success_rate": 1.0,
            }
        except Exception as e:  # graceful per-K failure (reference :380-438)
            summary[f"k={k}"] = {
                "tokens_per_sec": _stats([]),
                "acceptance_rate": _stats([]),
                "success_rate": 0.0,
                "error": f"{type(e).__name__}: {e}",
            }

    results = {
        "system_info": system_info(),
        "config": {
            "base_model": base_model,
            "draft_model": draft_model,
            "implementation": implementation,
            "max_new_tokens": max_new_tokens,
            "iterations": iterations,
            "policy": policy,
            "quantization": quantization,
        },
        "summary_results": summary,
        "detailed_results": detailed,
    }
    if output_dir:
        save_results(results, output_dir)
    return results


def save_results(results: Dict[str, Any], output_dir: str) -> Dict[str, str]:
    """CSV + JSON archive (reference save_results, :1016-1060)."""
    os.makedirs(output_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    base = os.path.join(output_dir, f"specdx_{jax.default_backend()}_{stamp}")
    with open(base + ".json", "w") as f:
        json.dump(results, f, indent=2)
    with open(base + ".csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["k", "tok_s_mean", "tok_s_std", "acceptance_mean", "acceptance_std",
             "step_latency_ms_mean", "success_rate"]
        )
        for key, row in results["summary_results"].items():
            w.writerow(
                [
                    key.split("=")[1],
                    row["tokens_per_sec"]["mean"],
                    row["tokens_per_sec"]["std"],
                    row["acceptance_rate"]["mean"],
                    row["acceptance_rate"]["std"],
                    row.get("step_latency_ms", {}).get("mean", ""),
                    row.get("success_rate", ""),
                ]
            )
    paths = {"json": base + ".json", "csv": base + ".csv"}
    try:
        paths.update(create_plots(results, base))
    except Exception:
        pass  # matplotlib optional
    return paths


def create_plots(results: Dict[str, Any], base: str) -> Dict[str, str]:
    """throughput-vs-K / acceptance-vs-K plots (reference :1063-1160)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ks, tps, accs = [], [], []
    for key, row in sorted(results["summary_results"].items()):
        if row.get("success_rate", 0) or row.get("dry_run"):
            ks.append(int(key.split("=")[1]))
            tps.append(row["tokens_per_sec"]["mean"])
            accs.append(row["acceptance_rate"]["mean"])
    out = {}
    for name, ys, label in [
        ("throughput_vs_k", tps, "tokens/sec"),
        ("acceptance_vs_k", accs, "acceptance rate"),
    ]:
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(ks, ys, marker="o")
        ax.set_xlabel("K (draft length)")
        ax.set_ylabel(label)
        ax.grid(True, alpha=0.3)
        fig.tight_layout()
        path = f"{base}_{name}.png"
        fig.savefig(path, dpi=120)
        plt.close(fig)
        out[name] = path
    return out
