"""Structured profiling: per-step timings, acceptance histogram, traces.

Reference parity:
- StructuredProfiler (src/metrics/structured_profiler.py:24): per-step
  draft/verify/acceptance timing + JSON export. On TPU the step is one fused
  XLA program, so the honest per-step unit is the whole step (blocking
  `block_until_ready` timing when profiling is on); phase-level attribution
  comes from `jax.profiler` traces (TensorBoard/Perfetto) instead of CUDA
  events.
- DetailedProfiler (src/metrics/detailed_profiler.py:16): acceptance-length
  histogram + memory samples.
- MemoryProfiler (src/metrics/memory_profiler.py:13): device memory stats,
  with a host-RSS fallback when the runtime doesn't expose memory_stats
  (e.g. tunneled devices).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import Counter
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax


@dataclass
class MemoryStats:
    device_bytes_in_use: Optional[int] = None
    device_peak_bytes: Optional[int] = None
    host_rss_mb: Optional[float] = None

    def as_dict(self) -> dict:
        return {
            "device_mem_mb": (
                self.device_bytes_in_use / 1e6
                if self.device_bytes_in_use is not None
                else None
            ),
            "device_peak_mb": (
                self.device_peak_bytes / 1e6
                if self.device_peak_bytes is not None
                else None
            ),
            "mem_rss_mb": self.host_rss_mb,
        }


def device_memory_stats() -> MemoryStats:
    out = MemoryStats()
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            out.device_bytes_in_use = stats.get("bytes_in_use")
            out.device_peak_bytes = stats.get("peak_bytes_in_use")
    except Exception:
        pass
    try:
        import resource

        out.host_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    except Exception:
        pass
    return out


def slope_chain_ms(fn, params, init, lo: int = 10, hi: int = 40) -> float:
    """Slope-timed cost of one fn(params, carry) -> carry call.

    Times a dependent lax.scan chain at two lengths and returns
    (t(hi) - t(lo)) / (hi - lo): the fixed dispatch + completion-fetch
    overhead (a full relay RTT on tunneled TPU runtimes, ~27 ms — more
    than a 3B decode step) cancels out. Completion is forced with a
    data-dependent scalar device_get, not block_until_ready, which can
    ack early through tunnels (docs/RESULTS.md "measurement trap").
    Params are a jit argument — closing over them would embed multi-GB
    weight constants in the compiled program. The same technique drives
    scripts/attn_b_probe.py and scripts/batch_scaling_probe.py."""
    t_lo = _chain_once(fn, params, init, lo)
    t_hi = _chain_once(fn, params, init, hi)
    return (t_hi - t_lo) / (hi - lo)


def _chain_once(fn, params, init, iters: int) -> float:
    @jax.jit
    def chain(params, carry):
        return jax.lax.scan(
            lambda c, _: (fn(params, c), None), carry, None, length=iters
        )[0]

    def run() -> float:
        t0 = time.perf_counter()
        out = chain(params, init)
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[:1])
        return (time.perf_counter() - t0) * 1e3

    run()  # compile
    return sorted(run() for _ in range(3))[1]


def _mean_std(xs: List[float]) -> Dict[str, float]:
    if not xs:
        return {"mean": 0.0, "std": 0.0, "n": 0}
    m = sum(xs) / len(xs)
    var = sum((x - m) ** 2 for x in xs) / len(xs)
    return {"mean": m, "std": var**0.5, "n": len(xs)}


@dataclass
class StructuredProfiler:
    enabled: bool = False
    step_ms: List[float] = field(default_factory=list)
    prefill_ms: List[float] = field(default_factory=list)
    accept_hist: Counter = field(default_factory=Counter)
    run_metadata: Dict[str, Any] = field(default_factory=dict)
    # Per-phase step attribution (draft/verify/commit ms — reference
    # structured_profiler.py:88-156). Populated by Engine.profile_phases:
    # the TPU step is one fused XLA program, so phases are slope-timed as
    # isolated programs, not event-timed inside the step.
    phase_ms: Optional[Dict[str, Any]] = None

    def record_step(self, ms: float, accepted: Optional[int] = None) -> None:
        if not self.enabled:
            return
        self.step_ms.append(ms)
        if accepted is not None:
            self.accept_hist[int(accepted)] += 1

    def record_prefill(self, ms: float) -> None:
        if self.enabled:
            self.prefill_ms.append(ms)

    @contextlib.contextmanager
    def time_step(self, result_to_block=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.step_ms.append((time.perf_counter() - t0) * 1e3)

    def summary(self) -> dict:
        return {
            "enabled": self.enabled,
            "step_ms": _mean_std(self.step_ms),
            "prefill_ms": _mean_std(self.prefill_ms),
            "phase_ms": self.phase_ms,
            "acceptance_histogram": dict(sorted(self.accept_hist.items())),
            "memory": device_memory_stats().as_dict(),
            "run_metadata": self.run_metadata,
        }

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)

    @contextlib.contextmanager
    def trace(self, logdir: str):
        """jax.profiler trace capture (TensorBoard/Perfetto) — the TPU
        analogue of the reference's torch.profiler chrome-trace export
        (src/benchmarks/profiler.py:117-124)."""
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
