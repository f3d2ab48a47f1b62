"""BenchmarkRunner: spec-decode vs non-speculative baseline comparison.

Reference parity: src/benchmarks/run_bench.py:40 (`BenchmarkRunner`: modes
local/specdec with warmup + N iterations, mean/median/std for latency &
tok/s & acceptance :261-300, optional baseline comparison :328 and
perplexity eval :112-129) and src/server/local_baseline.py:23
(`LocalBaselineRunner`, the non-speculative baseline — here mode="baseline"
drives the same engine with draft_model=None). The reference's third mode,
an HTTP vLLM client (src/server/ping_vllm.py), maps to mode="http" hitting
any OpenAI-compatible server.
"""

from __future__ import annotations

import json
import statistics
import time
from typing import Any, Dict, List, Optional

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine


def _stats(xs: List[float]) -> Dict[str, float]:
    if not xs:
        return {"mean": float("nan"), "std": float("nan"), "median": float("nan")}
    return {
        "mean": statistics.fmean(xs),
        "std": statistics.pstdev(xs) if len(xs) > 1 else 0.0,
        "median": statistics.median(xs),
    }


class BenchmarkRunner:
    def __init__(
        self,
        mode: str = "specdec",  # "specdec" | "baseline" | "http"
        config: Optional[EngineConfig] = None,
        warmup: int = 1,
        iterations: int = 5,
        server_url: Optional[str] = None,
        **config_overrides: Any,
    ):
        self.mode = mode
        self.warmup = warmup
        self.iterations = iterations
        self.server_url = server_url
        cfg = config or EngineConfig()
        if config_overrides:
            cfg = cfg.override(**config_overrides)
        if mode == "baseline":
            cfg = cfg.override(draft_model=None) if cfg.draft_model else cfg
            cfg.draft_model = None
        self.config = cfg
        self.engine = Engine(cfg) if mode != "http" else None

    def run(self, prompts: List[str], max_new_tokens: int = 64) -> Dict[str, Any]:
        if self.mode == "http":
            return self._run_http(prompts, max_new_tokens)
        eng = self.engine
        for p in prompts[:1] * self.warmup:
            eng.generate(p, max_new_tokens=8)
        lat, tok_s, acc = [], [], []
        for _ in range(self.iterations):
            for p in prompts:
                r = eng.generate(p, max_new_tokens=max_new_tokens)
                lat.append(r["generation_time_ms"])
                tok_s.append(r["tokens_per_sec"])
                acc.append(r["acceptance_rate"])
        return {
            "mode": self.mode,
            "latency_ms": _stats(lat),
            "tokens_per_sec": _stats(tok_s),
            "acceptance_rate": _stats(acc),
            "iterations": self.iterations,
            "n_prompts": len(prompts),
        }

    def compare_to_baseline(
        self, prompts: List[str], max_new_tokens: int = 64
    ) -> Dict[str, Any]:
        """Spec-decode vs non-speculative on the same target model
        (reference run_bench.py:328)."""
        spec = self.run(prompts, max_new_tokens)
        base_runner = BenchmarkRunner(
            mode="baseline",
            config=self.config,
            warmup=self.warmup,
            iterations=self.iterations,
        )
        base = base_runner.run(prompts, max_new_tokens)
        speedup = (
            spec["tokens_per_sec"]["mean"] / base["tokens_per_sec"]["mean"]
            if base["tokens_per_sec"]["mean"]
            else float("nan")
        )
        return {"specdec": spec, "baseline": base, "speedup": speedup}

    def _run_http(self, prompts: List[str], max_new_tokens: int) -> Dict[str, Any]:
        """OpenAI-compatible completion endpoint client (reference
        VLLMPingClient, src/server/ping_vllm.py:24)."""
        import urllib.request

        lat = []
        for _ in range(self.iterations):
            for p in prompts:
                body = json.dumps(
                    {"prompt": p, "max_tokens": max_new_tokens}
                ).encode()
                req = urllib.request.Request(
                    f"{self.server_url}/v1/completions",
                    data=body,
                    headers={"Content-Type": "application/json"},
                )
                t0 = time.perf_counter()
                with urllib.request.urlopen(req, timeout=60) as resp:
                    resp.read()
                lat.append((time.perf_counter() - t0) * 1e3)
        return {"mode": "http", "latency_ms": _stats(lat)}
