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
        # Warm up at the MEASUREMENT shape: max_new_tokens is a static shape
        # under jit, so warming with a different value would leave the first
        # timed iteration paying full compilation (the 6x trap documented in
        # k_sweep.py warmup).
        for p in prompts[:1] * self.warmup:
            eng.generate(p, max_new_tokens=max_new_tokens)
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

    # -- HTTP mode (reference VLLMPingClient, src/server/ping_vllm.py:24-305:
    # health endpoint polling, per-request retries, completions AND
    # chat/completions) --

    def check_health(self, timeout_s: float = 10.0, interval_s: float = 0.5) -> bool:
        """Poll /health (falling back to /v1/models) until the server
        answers or the deadline passes (reference ping_vllm health loop)."""
        import urllib.error
        import urllib.request

        deadline = time.perf_counter() + timeout_s
        while time.perf_counter() < deadline:
            for path in ("/health", "/v1/models"):
                try:
                    with urllib.request.urlopen(
                        f"{self.server_url}{path}", timeout=5
                    ) as resp:
                        if resp.status < 500:
                            return True
                except (urllib.error.URLError, OSError):
                    continue
            time.sleep(interval_s)
        return False

    def _http_one(
        self, prompt: str, max_new_tokens: int, chat: bool, retries: int = 3
    ) -> Dict[str, Any]:
        import urllib.error
        import urllib.request

        if chat:
            path = "/v1/chat/completions"
            payload = {
                "messages": [{"role": "user", "content": prompt}],
                "max_tokens": max_new_tokens,
            }
        else:
            path = "/v1/completions"
            payload = {"prompt": prompt, "max_tokens": max_new_tokens}
        body = json.dumps(payload).encode()
        last_err: Optional[str] = None
        for attempt in range(retries):
            req = urllib.request.Request(
                f"{self.server_url}{path}",
                data=body,
                headers={"Content-Type": "application/json"},
            )
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=120) as resp:
                    data = json.loads(resp.read())
                ms = (time.perf_counter() - t0) * 1e3
                toks = data.get("usage", {}).get("completion_tokens")
                return {"ok": True, "latency_ms": ms, "completion_tokens": toks}
            except (urllib.error.URLError, OSError, ValueError) as e:
                last_err = f"{type(e).__name__}: {e}"
                time.sleep(0.5 * (attempt + 1))  # backoff then retry
        return {"ok": False, "error": last_err}

    def _run_http(self, prompts: List[str], max_new_tokens: int) -> Dict[str, Any]:
        """OpenAI-compatible endpoint client with health check + retries."""
        healthy = self.check_health(
            timeout_s=getattr(self, "health_timeout_s", 10.0)
        )
        chat = getattr(self, "http_chat", False)
        lat, tok_s, failures = [], [], 0
        if healthy:
            for _ in range(self.iterations):
                for p in prompts:
                    r = self._http_one(p, max_new_tokens, chat)
                    if not r["ok"]:
                        failures += 1
                        continue
                    lat.append(r["latency_ms"])
                    if r.get("completion_tokens"):
                        tok_s.append(r["completion_tokens"] / (r["latency_ms"] / 1e3))
        total = self.iterations * len(prompts)
        return {
            "mode": "http",
            "healthy": healthy,
            "endpoint": "chat/completions" if chat else "completions",
            "latency_ms": _stats(lat),
            "tokens_per_sec": _stats(tok_s),
            "success_rate": (total - failures) / total if healthy and total else 0.0,
        }
